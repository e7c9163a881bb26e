"""Command-line interface mirroring the reference ``Relate`` binary modes
(include/pipeline/Relate.cpp:60-314).

Usage:
  python -m relate_tpu.pipeline.cli --mode All --haps x.haps.gz \
      --sample x.sample.gz --map map.txt -N 30000 -m 1.25e-8 -o out --seed 1
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

from . import relate
from ..io.chunking import ArtifactStore


def build_parser():
    p = argparse.ArgumentParser(prog="relate_tpu")
    p.add_argument("--mode", required=True,
                   choices=["All", "MakeChunks", "Paint", "BuildTopology",
                            "FindEquivalentBranches", "InferBranchLengths",
                            "CombineSections", "Finalize", "PostProcess",
                            "OptimizeParameters", "Clean"])
    p.add_argument("--haps")
    p.add_argument("--sample")
    p.add_argument("--map", dest="map_path")
    p.add_argument("--dist")
    p.add_argument("-N", "--effectiveN", type=float, default=3e4)
    p.add_argument("-m", "--mutation_rate", type=float, default=1.25e-8)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--memory", type=float, default=None,
                   help="window-planner budget in GB; default: sized from device HBM")
    p.add_argument("--theta", type=float, default=0.001)
    p.add_argument("--coal")
    p.add_argument("--annot")
    p.add_argument("--sample_ages")
    p.add_argument("--chunk_index", type=int, default=0)
    p.add_argument("--first_section", type=int, default=0)
    p.add_argument("--last_section", type=int, default=None)
    p.add_argument("--no_consistency", action="store_true")
    p.add_argument("--anc_allele_unknown", action="store_true")
    p.add_argument("--transversion", action="store_true")
    p.add_argument("--fb", type=int, default=0)
    # --painting "theta,rho" overrides the painting parameters
    # (Paint.cpp:38-61); rho multiplies the per-SNP recombination rates
    p.add_argument("--painting",
                   type=lambda s: tuple(map(float, s.split(","))))
    p.add_argument("--postprocess", action="store_true")
    p.add_argument("--randomise", action="store_true")
    # OptimizeParameters --input: line 1 thetas, line 2 rho factors
    p.add_argument("--input")
    # Finalize: where the stage artifacts live. Defaults to <output>.tmpdir
    # (the run_all layout); the per-stage flow passes the MakeChunks -o dir
    p.add_argument("--store")
    # shard device work (painting targets, MCMC tree batches) over the
    # first N jax devices — the TPU replacement for RelateParallel.sh
    # --threads (SURVEY §2.5)
    p.add_argument("--devices", type=int, default=0)
    # host thread pool over chunks (RelateParallel.sh --threads): chunk
    # stages overlap host-bound work with device dispatches
    p.add_argument("--threads", type=int, default=1)
    return p


def read_coal_file(path: str):
    """Parse a .coal file: line 1 group names, line 2 epoch boundaries
    (generations), then 'g1 g2 rate...' rows
    (FinalizePopulationSize.cpp:96-110)."""
    with open(path) as f:
        f.readline()
        epochs = np.asarray([float(x) for x in f.readline().split()])
        line = f.readline().split()
        rates = np.asarray([float(x) for x in line[2:]])
    return epochs, rates


def main(argv=None):
    args = build_parser().parse_args(argv)
    out = args.output
    mode = args.mode
    coal = read_coal_file(args.coal) if args.coal else None
    theta = args.theta
    rho_scale = 1.0
    if args.painting:
        theta, rho_scale = args.painting
    mesh = None
    if args.devices:
        from ..parallel.mesh import default_mesh
        mesh = default_mesh(args.devices)

    if mode == "All":
        relate.run_all(args.haps, args.sample, args.map_path, out,
                       Ne=args.effectiveN, mu=args.mutation_rate,
                       seed=args.seed, memory_gb=args.memory,
                       theta=theta, dist_path=args.dist,
                       use_transitions=not args.transversion,
                       sample_ages_path=args.sample_ages, coal=coal,
                       rho_scale=rho_scale, postprocess=args.postprocess,
                       annot_path=args.annot, mesh=mesh,
                       threads=args.threads)
        return 0

    from ..utils.trace import stage
    _stage_cm = stage(mode)
    _stage_cm.__enter__()
    store = ArtifactStore(args.store if args.store else
                          (out if mode != "Finalize" else out + ".tmpdir"))
    if mode == "MakeChunks":
        relate.make_chunks(args.haps, args.sample, args.map_path, out,
                           args.memory, args.dist, not args.transversion,
                           args.sample_ages)
    elif mode == "Paint":
        relate.paint(store, args.chunk_index, theta, rho_scale=rho_scale,
                     mesh=mesh)
    elif mode == "BuildTopology":
        relate.build_topology(store, args.chunk_index, seed=args.seed,
                              theta=theta, rho_scale=rho_scale,
                              mode=0 if args.no_consistency else 1,
                              ancestral_state=not args.anc_allele_unknown,
                              fb=args.fb,
                              first_section=args.first_section,
                              last_section=args.last_section, mesh=mesh)
    elif mode == "FindEquivalentBranches":
        relate.find_equivalent_branches(store, args.chunk_index)
    elif mode == "PostProcess":
        # PostProcess + re-association, matching Relate.cpp:296-302
        relate.post_process_chunk(store, args.chunk_index, seed=args.seed,
                                  randomise=args.randomise)
        relate.find_equivalent_branches(store, args.chunk_index)
    elif mode == "InferBranchLengths":
        epochs, rates = coal if coal else (None, None)
        relate.infer_branch_lengths(store, args.chunk_index,
                                    Ne=args.effectiveN,
                                    mu=args.mutation_rate, seed=args.seed,
                                    epochs=epochs, rates=rates,
                                    first_section=args.first_section,
                                    last_section=args.last_section,
                                    mesh=mesh)
    elif mode == "CombineSections":
        relate.combine_sections(store, args.chunk_index)
    elif mode == "OptimizeParameters":
        thetas = rhos = None
        if args.input:
            thetas, rhos = relate.read_opt_grid(args.input)
        results = relate.optimize_parameters(store, args.chunk_index,
                                             thetas=thetas,
                                             rho_scales=rhos,
                                             seed=args.seed)
        relate.write_opt(out + ".opt", results)
    elif mode == "Finalize":
        relate.finalize(store, out, annot_path=args.annot)
    elif mode == "Clean":
        import shutil
        shutil.rmtree(out + ".tmpdir", ignore_errors=True)
    _stage_cm.__exit__(None, None, None)
    return 0


if __name__ == "__main__":
    sys.exit(main())

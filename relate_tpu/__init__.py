"""relate-tpu: a TPU-native genealogy-inference framework.

Re-implements the capabilities of Relate (Speidel et al., Nature Genetics 2019;
reference C++ at MyersGroup/relate) as an idiomatic JAX/XLA/Pallas framework:

- Li & Stephens chromosome-painting HMM as batched device scans
  (``relate_tpu.core.painting``), replacing ``include/src/fast_painting.cpp``.
- Distance-matrix assembly + MinMatch hierarchical tree building as vectorized
  JAX programs (``relate_tpu.core.distance``, ``relate_tpu.core.treebuilder``),
  replacing ``include/src/tree_builder.cpp`` / ``anc_builder.cpp``.
- Branch-length MCMC under the coalescent, vmapped over trees
  (``relate_tpu.core.mcmc``), replacing ``include/src/branch_length_estimator.cpp``.
- Population-size / mutation-rate EM and selection scans with on-device
  sufficient statistics (``relate_tpu.evaluate``), replacing
  ``include/evaluate/*``.
- Multi-host/multi-chip scaling via ``jax.sharding`` meshes
  (``relate_tpu.parallel``), replacing the RelateParallel/SGE/Slurm shell layer.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (opt out: RELATE_TPU_CACHE=0).

    The painting/topology kernels take minutes to compile for a new panel
    shape; caching makes repeat runs (and multi-process pipelines) start in
    seconds."""
    if _os.environ.get("RELATE_TPU_CACHE", "1") == "0":
        return
    try:
        import jax
        cache_dir = _os.environ.get(
            "RELATE_TPU_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "relate_tpu_jax"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

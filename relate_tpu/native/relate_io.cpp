// Native IO runtime for relate-tpu: streaming .haps/.sample parsing and
// .anc text serialization.
//
// The reference framework's data loading is C++ (gzip popen + fscanf,
// include/src/data.cpp:6-67,543-573); this is its TPU-framework
// equivalent: zlib-streamed parsing straight into bit-packed numpy-owned
// buffers, exposed through a C ABI consumed via ctypes (no pybind11
// dependency). The .anc writer serializes tree records in one pass (the
// Python formatter is the bottleneck when dumping 10^4-10^5 trees).

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Count haplotypes from a .sample file: 2 header lines, then one row per
// individual; diploid (2 haplotypes) if ID_1 == ID_2 else haploid.
int rt_count_sample(const char* path) {
  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  char line[1 << 16];
  int n = 0, row = 0;
  while (gzgets(f, line, sizeof(line))) {
    row++;
    if (row <= 2) continue;
    char id1[4096], id2[4096];
    if (sscanf(line, "%4095s %4095s", id1, id2) != 2) continue;
    n += (strcmp(id1, id2) == 0) ? 2 : 1;
  }
  gzclose(f);
  return n;
}

// Count lines (SNPs) of a .haps file.
long rt_count_lines(const char* path) {
  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  char buf[1 << 16];
  long lines = 0;
  int len;
  bool last_nl = true;
  while ((len = gzread(f, buf, sizeof(buf))) > 0) {
    for (int i = 0; i < len; i++)
      if (buf[i] == '\n') lines++;
    last_nl = buf[len - 1] == '\n';
  }
  if (!last_nl) lines++;
  gzclose(f);
  return lines;
}

// Parse a .haps file: per SNP "chr rsid bp anc alt a_1 ... a_N".
// Fills G (L*N uint8), bp (L int64) and meta (L*meta_stride char, three
// NUL-separated fields rsid/anc/alt per row). Returns parsed SNP count or
// negative on error.
long rt_read_haps(const char* path, int N, long L, uint8_t* G, int64_t* bp,
                  char* meta, int meta_stride) {
  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  size_t cap = (size_t)(2 * N + 1 << 12);
  char* line = (char*)malloc(cap);
  if (!line) { gzclose(f); return -2; }
  long snp = 0;
  while (snp < L && gzgets(f, line, (int)cap)) {
    char* s = line;
    // field 1: chr (skipped)
    while (*s && *s != ' ' && *s != '\t') s++;
    while (*s == ' ' || *s == '\t') s++;
    // field 2: rsid
    char* rs = s;
    while (*s && *s != ' ' && *s != '\t') s++;
    size_t rslen = (size_t)(s - rs);
    while (*s == ' ' || *s == '\t') s++;
    // field 3: bp
    bp[snp] = strtoll(s, &s, 10);
    while (*s == ' ' || *s == '\t') s++;
    // field 4: ancestral
    char* an = s;
    while (*s && *s != ' ' && *s != '\t') s++;
    size_t anlen = (size_t)(s - an);
    while (*s == ' ' || *s == '\t') s++;
    // field 5: alternative
    char* al = s;
    while (*s && *s != ' ' && *s != '\t') s++;
    size_t allen = (size_t)(s - al);
    // alleles
    uint8_t* row = G + (size_t)snp * N;
    int k = 0;
    while (*s && k < N) {
      if (*s == '0') row[k++] = 0;
      else if (*s == '1') row[k++] = 1;
      s++;
    }
    if (k != N) { free(line); gzclose(f); return -3 - snp; }
    // meta: rsid\0anc\0alt\0
    char* m = meta + (size_t)snp * meta_stride;
    size_t off = 0;
    size_t lim = (size_t)meta_stride - 3;
    if (rslen > lim / 3) rslen = lim / 3;
    memcpy(m + off, rs, rslen); off += rslen; m[off++] = 0;
    if (anlen > lim / 3) anlen = lim / 3;
    memcpy(m + off, an, anlen); off += anlen; m[off++] = 0;
    if (allen > lim / 3) allen = lim / 3;
    memcpy(m + off, al, allen); off += allen; m[off++] = 0;
    snp++;
  }
  free(line);
  gzclose(f);
  return snp;
}

// Write marginal-tree lines of a text .anc: per tree
// "pos: p:(%.5f %.3f sb se) ... \n" (anc.cpp:797-815 format).
// parents: (T*Mn) int32; bl: f64; ne: f32; sb/se: i32; pos: (T,) i32.
static void format_tree_range(long t0, long t1, int Mn, const int32_t* pos,
                              const int32_t* parents, const double* bl,
                              const float* ne, const int32_t* sb,
                              const int32_t* se, std::string* out) {
  out->reserve((size_t)(t1 - t0) * Mn * 40);
  char buf[128];
  for (long t = t0; t < t1; t++) {
    int n0 = snprintf(buf, sizeof buf, "%d: ", pos[t]);
    out->append(buf, n0);
    const int32_t* P = parents + (size_t)t * Mn;
    const double* B = bl + (size_t)t * Mn;
    const float* E = ne + (size_t)t * Mn;
    const int32_t* S0 = sb + (size_t)t * Mn;
    const int32_t* S1 = se + (size_t)t * Mn;
    for (int n = 0; n < Mn; n++) {
      int k = snprintf(buf, sizeof buf, "%d:(%.5f %.3f %d %d) ", P[n],
                       (double)B[n], (double)E[n], S0[n], S1[n]);
      out->append(buf, k);
    }
    out->push_back('\n');
  }
}

int rt_write_anc_trees(const char* path, const char* header, long T, int Mn,
                       const int32_t* pos, const int32_t* parents,
                       const double* bl, const float* ne,
                       const int32_t* sb, const int32_t* se) {
  FILE* f = fopen(path, "ab");
  if (!f) return -1;
  if (header && header[0]) fputs(header, f);
  // snprintf-format tree ranges in parallel (the float formatting is the
  // bottleneck at 10^4+ trees), then write the buffers in order
  unsigned hw = std::thread::hardware_concurrency();
  long nthreads = hw ? (long)hw : 4;
  if (nthreads > 8) nthreads = 8;
  if (nthreads > T) nthreads = T > 0 ? T : 1;
  std::vector<std::string> bufs((size_t)nthreads);
  std::vector<std::thread> threads;
  long per = (T + nthreads - 1) / nthreads;
  for (long i = 0; i < nthreads; i++) {
    long t0 = i * per, t1 = t0 + per < T ? t0 + per : T;
    if (t0 >= t1) break;
    threads.emplace_back(format_tree_range, t0, t1, Mn, pos, parents, bl,
                         ne, sb, se, &bufs[(size_t)i]);
  }
  for (auto& th : threads) th.join();
  int rc = 0;
  for (auto& b : bufs)
    if (!b.empty() && fwrite(b.data(), 1, b.size(), f) != b.size()) rc = -2;
  fclose(f);
  return rc;
}

}  // extern "C"

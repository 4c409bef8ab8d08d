// Native writer for the step-5 neighbors artifact (.tsv.gz).
//
// The Python writer (io/formats.py write_neighbors_dense) vectorizes the
// %.2f formatting with np.char.mod but still spends ~2 s formatting +
// joining 2504 x 1502 object cells, ~2.6 s of the 17.8 s e2e pipeline
// (docs/perf.md r4-final). This C path reuses the bedwrite machinery:
// the %.2f-identical integer cents formatter (fuzz-pinned, snprintf
// guard band for exact-tie neighborhoods; plain snprintf for negatives)
// and the BGZF/libdeflate block writer (every gzip consumer reads BGZF;
// GRID_TPU_BED_FORMAT=gzip selects the legacy single-member stream).
//
// Line format (grid/utils/find_neighbors.py:231-267):
//   ID \t scale \t (nbrID \t nbrScale \t dist) * k \n

#include <cstdint>
#include <cstring>
#include <vector>

#include "bedwrite.h"

namespace {

inline void append_f2(std::string& out, double v, char* buf) {
  if (v < 0.0) {  // bed_depth_cents is unsigned-domain; defer to printf
    int m = snprintf(buf, 64, "%.2f", v);
    out.append(buf, (size_t)(m > 0 ? m : 0));
    return;
  }
  long long cents = gridtpu::bed_depth_cents(v);
  char* q = gridtpu::bed_u64toa((unsigned long long)(cents / 100), buf);
  *q++ = '.';
  *q++ = (char)('0' + (char)((cents / 10) % 10));
  *q++ = (char)('0' + (char)(cents % 10));
  out.append(buf, (size_t)(q - buf));
}

}  // namespace

extern "C" {

// ids: NUL-separated buffer of n sample IDs (row order).
// scales: [n]; nbr_idx: [n*k] row indices into ids; dists: [n*k].
// Returns 0, -1 on open failure, -2 on write/close failure, -3 on a
// neighbor index out of range.
int grid_write_neighbors(const char* path, const char* ids, int64_t n,
                         int64_t k, const double* scales,
                         const int64_t* nbr_idx, const double* dists) {
  std::vector<const char*> idp((size_t)n);
  std::vector<size_t> idlen((size_t)n);
  const char* p = ids;
  for (int64_t i = 0; i < n; ++i) {
    idp[i] = p;
    idlen[i] = strlen(p);
    p += idlen[i] + 1;
  }

  // per-sample scale string, formatted once (each appears k-ish times)
  std::vector<std::string> sstr((size_t)n);
  char buf[80];
  for (int64_t i = 0; i < n; ++i) append_f2(sstr[i], scales[i], buf);

  gridtpu::BedWriter w;
  if (!w.open(path)) return -1;
  for (int64_t i = 0; i < n; ++i) {
    w.chunk.append(idp[i], idlen[i]);
    w.chunk.push_back('\t');
    w.chunk.append(sstr[i]);
    const int64_t* row_idx = nbr_idx + i * k;
    const double* row_d = dists + i * k;
    for (int64_t j = 0; j < k; ++j) {
      int64_t t = row_idx[j];
      if (t < 0 || t >= n) {
        w.close();
        return -3;
      }
      w.chunk.push_back('\t');
      w.chunk.append(idp[t], idlen[t]);
      w.chunk.push_back('\t');
      w.chunk.append(sstr[t]);
      w.chunk.push_back('\t');
      append_f2(w.chunk, row_d[j], buf);
      if (w.chunk.size() > 0xf000) w.flush();
    }
    w.chunk.push_back('\n');
    if (w.chunk.size() > 0xf000) w.flush();
  }
  return w.close() ? 0 : -2;
}

}  // extern "C"

// Fast regions.bed.gz reader (zlib), feeding grid_tpu's host staging.
//
// Replaces the Python gzip+split line scan of the reference
// (grid/utils/normalize_mosdepth.py:262-285) — the dominant ingestion cost
// at cohort scale — with a buffered inflate + handwritten field parser.
// Filter semantics are identical:
//   * optional chromosome prefix match on the RAW line text;
//   * with a window: keep depth > 0 && reg_end >= win_start && reg_start <= win_end;
//     without: keep depth > 0;
//   * drop regions whose kb bins (start/1000 .. end/1000 inclusive) intersect
//     the per-chromosome exclusion list (repeat mask).
//
// C ABI: results are malloc'd arrays owned by the callee until
// grid_bed_free() is called.

#include <zlib.h>

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Mask {
  // chrom name -> sorted kb bins
  std::unordered_map<std::string, std::unordered_set<int64_t>> bins;

  bool excluded(const char* chrom, size_t chrom_len, int64_t start, int64_t end) const {
    if (bins.empty()) return false;
    auto it = bins.find(std::string(chrom, chrom_len));
    if (it == bins.end()) return false;
    const auto& s = it->second;
    for (int64_t kb = start / 1000; kb <= end / 1000; ++kb) {
      if (s.count(kb)) return true;
    }
    return false;
  }
};

// Parse a non-negative integer; returns pointer past the number or nullptr.
inline const char* parse_i64(const char* p, const char* lim, int64_t* out) {
  if (p >= lim) return nullptr;
  int64_t v = 0;
  bool any = false;
  while (p < lim && *p >= '0' && *p <= '9') {
    v = v * 10 + (*p - '0');
    ++p;
    any = true;
  }
  if (!any) return nullptr;
  *out = v;
  return p;
}

inline const char* parse_double(const char* p, const char* lim, double* out) {
  if (p >= lim) return nullptr;
  char buf[64];
  size_t n = 0;
  while (p < lim && *p != '\t' && *p != '\n' && *p != '\r' && n < sizeof(buf) - 1) {
    buf[n++] = *p++;
  }
  if (n == 0) return nullptr;
  buf[n] = 0;
  char* endp = nullptr;
  *out = strtod(buf, &endp);
  if (endp == buf) return nullptr;
  return p;
}

}  // namespace

extern "C" {

// chrom_filter: "chrN" prefix to require, or NULL.
// has_window: 0/1; win_start/win_end used when 1.
// mask_*: n_mask_chroms chromosome names in mask_names (NUL-separated),
//         mask_offsets[i]..mask_offsets[i+1] index into mask_kb.
// Outputs: *out_n rows in three malloc'd arrays. Returns 0 on success.
int grid_bed_read(const char* path, const char* chrom_filter, int has_window,
                  int64_t win_start, int64_t win_end, const char* mask_names,
                  int32_t n_mask_chroms, const int64_t* mask_offsets,
                  const int64_t* mask_kb, int64_t** out_starts,
                  int64_t** out_ends, double** out_depths, int64_t* out_n) {
  *out_starts = nullptr;
  *out_ends = nullptr;
  *out_depths = nullptr;
  *out_n = 0;

  Mask mask;
  const char* name_p = mask_names;
  for (int32_t i = 0; i < n_mask_chroms; ++i) {
    std::string name(name_p);
    name_p += name.size() + 1;
    auto& s = mask.bins[name];
    for (int64_t j = mask_offsets[i]; j < mask_offsets[i + 1]; ++j) s.insert(mask_kb[j]);
  }

  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  gzbuffer(f, 1 << 20);

  std::vector<int64_t> starts, ends;
  std::vector<double> depths;

  const size_t BUF = 1 << 20;
  std::vector<char> buf(BUF);
  std::string carry;
  const size_t flt_len = chrom_filter ? strlen(chrom_filter) : 0;

  auto process_line = [&](const char* line, const char* lim) {
    if (line >= lim) return;
    // chromosome prefix filter on raw text (reference line.startswith)
    if (flt_len) {
      if ((size_t)(lim - line) < flt_len || memcmp(line, chrom_filter, flt_len) != 0) return;
    }
    // field 0: chrom
    const char* p = line;
    const char* tab = (const char*)memchr(p, '\t', lim - p);
    if (!tab) return;
    const char* chrom = p;
    size_t chrom_len = tab - p;
    // normalise "6" -> "chr6" for mask lookup (reference norm_chrom)
    char normed[64];
    const char* chrom_key = chrom;
    size_t chrom_key_len = chrom_len;
    if (chrom_len < 3 || memcmp(chrom, "chr", 3) != 0) {
      if (chrom_len + 3 < sizeof(normed)) {
        memcpy(normed, "chr", 3);
        memcpy(normed + 3, chrom, chrom_len);
        chrom_key = normed;
        chrom_key_len = chrom_len + 3;
      }
    }
    p = tab + 1;
    int64_t s, e;
    p = parse_i64(p, lim, &s);
    if (!p || p >= lim || *p != '\t') return;
    ++p;
    p = parse_i64(p, lim, &e);
    if (!p || p >= lim || *p != '\t') return;
    ++p;
    double d;
    p = parse_double(p, lim, &d);
    if (!p) return;

    if (has_window) {
      if (!(d > 0 && e >= win_start && s <= win_end)) return;
    } else if (d <= 0) {
      return;
    }
    if (mask.excluded(chrom_key, chrom_key_len, s, e)) return;

    starts.push_back(s);
    ends.push_back(e);
    depths.push_back(d);
  };

  for (;;) {
    int got = gzread(f, buf.data(), BUF);
    if (got < 0) {
      gzclose(f);
      return -2;
    }
    if (got == 0) break;
    const char* data = buf.data();
    int64_t off = 0;
    while (off < got) {
      const char* nl = (const char*)memchr(data + off, '\n', got - off);
      if (!nl) {
        carry.append(data + off, got - off);
        break;
      }
      if (!carry.empty()) {
        carry.append(data + off, nl - (data + off));
        process_line(carry.data(), carry.data() + carry.size());
        carry.clear();
      } else {
        process_line(data + off, nl);
      }
      off = (nl - data) + 1;
    }
  }
  if (!carry.empty()) process_line(carry.data(), carry.data() + carry.size());
  gzclose(f);

  int64_t n = (int64_t)starts.size();
  *out_starts = (int64_t*)malloc(sizeof(int64_t) * (n ? n : 1));
  *out_ends = (int64_t*)malloc(sizeof(int64_t) * (n ? n : 1));
  *out_depths = (double*)malloc(sizeof(double) * (n ? n : 1));
  if (!*out_starts || !*out_ends || !*out_depths) return -3;
  memcpy(*out_starts, starts.data(), sizeof(int64_t) * n);
  memcpy(*out_ends, ends.data(), sizeof(int64_t) * n);
  memcpy(*out_depths, depths.data(), sizeof(double) * n);
  *out_n = n;
  return 0;
}

void grid_bed_free(int64_t* starts, int64_t* ends, double* depths) {
  free(starts);
  free(ends);
  free(depths);
}

}  // extern "C"

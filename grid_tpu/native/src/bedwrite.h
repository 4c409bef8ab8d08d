// Fast %.2f-identical bed.gz emission shared by the BAM and CRAM binned-
// depth writers (and the fused ingest pass).
//
// The measured cost split for a dense genome-wide bed (160k bins):
// snprintf formatting 45 ms vs level-1 deflate 34 ms — so the formatter,
// not zlib, was the larger half of the binner's output wall. This header
// replaces snprintf with an integer fixed-point path that is byte-identical
// to printf's %.2f (fuzz-checked over 800k rationals in the commit that
// introduced it): depth cents are computed by round-half-even on the
// double (llrint under the default FP mode — the same tie rule printf
// applies to the decimal expansion), with an snprintf fallback inside a
// hairline guard band around exact .xx5 ties where one extra binary
// rounding could disagree.
#pragma once

#include <zlib.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <utility>
#include <vector>

namespace gridtpu {

inline char* bed_u64toa(unsigned long long v, char* p) {
  char tmp[20];
  int n = 0;
  do {
    tmp[n++] = (char)('0' + (char)(v % 10));
    v /= 10;
  } while (v);
  while (n) *p++ = tmp[--n];
  return p;
}

// Integer cents equal to what snprintf("%.2f", x) prints (x >= 0).
inline long long bed_depth_cents(double x) {
  double v = x * 100.0;
  long long k = llrint(v);  // round-half-even (default FP mode)
  double d = v - (double)k;
  if (d > 0.4999999 || d < -0.4999999) {
    // within one multiply-rounding of an exact tie: defer to printf
    char buf[48];
    snprintf(buf, sizeof buf, "%.2f", x);
    return llrint(strtod(buf, nullptr) * 100.0);
  }
  return k;
}

// Buffered level-1 gzip writer of "chrom\tstart\tend\tD.DD\n" lines.
struct BedWriter {
  gzFile out = nullptr;
  std::string chunk;
  bool write_err = false;

  bool open(const char* path) {
    out = gzopen(path, "wb1");
    if (!out) return false;
    gzbuffer(out, 1 << 20);
    chunk.reserve(1 << 20);
    return true;
  }

  void line(const char* name, size_t name_len, long long bs, long long be,
            long long cents) {
    char buf[192];
    char* p = buf;
    if (name_len > sizeof(buf) - 48) name_len = sizeof(buf) - 48;  // defensive
    memcpy(p, name, name_len);
    p += name_len;
    *p++ = '\t';
    p = bed_u64toa((unsigned long long)bs, p);
    *p++ = '\t';
    p = bed_u64toa((unsigned long long)be, p);
    *p++ = '\t';
    p = bed_u64toa((unsigned long long)(cents / 100), p);
    *p++ = '.';
    *p++ = (char)('0' + (char)((cents / 10) % 10));
    *p++ = (char)('0' + (char)(cents % 10));
    *p++ = '\n';
    chunk.append(buf, (size_t)(p - buf));
    if (chunk.size() > (1 << 20) - 256) flush();
  }

  void flush() {
    if (!chunk.empty()) {
      if (gzwrite(out, chunk.data(), (unsigned)chunk.size()) <= 0)
        write_err = true;
      chunk.clear();
    }
  }

  // returns false on any write/close error
  bool close() {
    flush();
    bool ok = gzclose(out) == Z_OK && !write_err;
    out = nullptr;
    return ok;
  }
};

// Emit the full binned-depth bed.gz (mosdepth regions.bed.gz format).
// skip_zero omits zero-depth bins EXCEPT each contig's final bin (the
// sparse file must still record the contig extent — see steps/coverage.py
// compute_region_coverage). Byte-identical to the earlier snprintf writer.
inline bool write_bins_bed(
    const char* out_path,
    const std::vector<std::pair<std::string, int64_t>>& refs,
    const std::vector<std::vector<int64_t>>& overlap, int32_t bin_size,
    bool skip_zero) {
  BedWriter w;
  if (!w.open(out_path)) return false;
  for (size_t i = 0; i < refs.size(); ++i) {
    const std::string& name = refs[i].first;
    const int64_t len = refs[i].second;
    const auto& bins = overlap[i];
    for (size_t b = 0; b < bins.size(); ++b) {
      if (skip_zero && bins[b] == 0 && b + 1 < bins.size()) continue;
      int64_t bs = (int64_t)b * bin_size;
      int64_t be = bs + bin_size < len ? bs + bin_size : len;
      long long cents = bed_depth_cents((double)bins[b] / (double)(be - bs));
      w.line(name.data(), name.size(), bs, be, cents);
    }
  }
  return w.close();
}

// Window products of the fused one-pass ingest: the step-3 coverage integer
// (identical accumulation order/types to steps/coverage.py
// compute_region_coverage re-reading the dense bed) and the staged
// depth>0 bins for in-process staging (identical filter semantics to
// io/bed.py read_regions_bed_gz: ref-name PREFIX match on the normalized
// window chromosome, bin_end >= wstart, bin_start <= wend, depth > 0).
struct WindowProducts {
  long long cov100 = 0;   // int(round(100 * overlap-weighted window mean))
  int64_t n_bins = 0;     // staged bins matched (> bins_cap => overflow)
  bool overflow = false;
};

inline WindowProducts collect_window_bins(
    const std::vector<std::pair<std::string, int64_t>>& refs,
    const std::vector<std::vector<int64_t>>& overlap, int32_t bin_size,
    int32_t cov_ref,            // ref index whose name == chrom EXACTLY, or -1
    const char* chrom_prefix,   // normalized prefix for staged-bin refs
    int64_t wstart, int64_t wend, int32_t* bins_refid, int64_t* bins_start,
    int64_t* bins_end, double* bins_depth, int64_t bins_cap) {
  WindowProducts out;
  const size_t plen = chrom_prefix ? strlen(chrom_prefix) : 0;
  double region_cov = 0.0;
  int64_t covered_bp = 0;
  for (size_t i = 0; i < refs.size(); ++i) {
    const std::string& name = refs[i].first;
    const int64_t len = refs[i].second;
    const bool stage_ref =
        plen > 0 && name.size() >= plen && memcmp(name.data(), chrom_prefix, plen) == 0;
    const bool cov_this = (int32_t)i == cov_ref;
    if (!stage_ref && !cov_this) continue;
    const auto& bins = overlap[i];
    int64_t b_lo = wstart / bin_size - 1;
    if (b_lo < 0) b_lo = 0;
    int64_t b_hi = wend / bin_size;
    if (b_hi > (int64_t)bins.size() - 1) b_hi = (int64_t)bins.size() - 1;
    for (int64_t b = b_lo; b <= b_hi; ++b) {
      int64_t bs = b * bin_size;
      int64_t be = bs + bin_size < len ? bs + bin_size : len;
      if (be < wstart || bs > wend) continue;  // inclusive window, per reader
      long long cents = bed_depth_cents((double)bins[b] / (double)(be - bs));
      if (cov_this) {
        // compute_region_coverage semantics: overlap = min(end, r_end) -
        // max(start, r_start), zero-depth bins still count in covered_bp
        int64_t ov = (wend < be ? wend : be) - (wstart > bs ? wstart : bs);
        if (ov > 0) {
          region_cov += ((double)cents / 100.0) * (double)ov;
          covered_bp += ov;
        }
      }
      if (stage_ref && cents > 0) {
        if (out.n_bins < bins_cap) {
          bins_refid[out.n_bins] = (int32_t)i;
          bins_start[out.n_bins] = bs;
          bins_end[out.n_bins] = be;
          bins_depth[out.n_bins] = (double)cents / 100.0;
        } else {
          out.overflow = true;
        }
        ++out.n_bins;
      }
    }
  }
  out.cov100 = covered_bp > 0 ? llrint(100.0 * (region_cov / (double)covered_bp)) : 0;
  return out;
}

}  // namespace gridtpu

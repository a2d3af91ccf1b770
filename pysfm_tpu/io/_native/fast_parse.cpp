// Native I/O tier: fast whitespace-separated numeric tokenizer for the
// BAL / Bundler text formats (pysfm_tpu/io/bal.py, bundler.py).
//
// The reference (alexflint/pysfm) is pure Python end to end (SURVEY §2
// "Native components: none"); this framework's runtime-around-the-compute
// path is native where it pays: parsing a Venice-scale BAL file (~100 MB of
// ASCII doubles) through Python's str.split() costs seconds and a 3x memory
// blow-up, while this single-pass strtod loop runs at memory bandwidth.
//
// Exposed via ctypes (pysfm_tpu/io/native.py) — no pybind11 in this image.
// Build: g++ -O3 -march=native -shared -fPIC fast_parse.cpp -o libpysfm_io.so

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// Parse up to max_out whitespace-separated doubles from buf[0..len).
// Returns the number parsed. Stops early at max_out or on a token that is
// not a number (returns count so far; caller validates the expected count).
int64_t pysfm_parse_doubles(const char* buf, int64_t len, double* out,
                            int64_t max_out) {
  const char* p = buf;
  const char* end = buf + len;
  int64_t n = 0;
  while (p < end && n < max_out) {
    // Skip whitespace.
    while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
      ++p;
    if (p >= end) break;
    char* next = nullptr;
    // strtod needs NUL-terminated input in the worst case; the caller
    // guarantees a NUL (or whitespace) terminator at buf[len].
    double v = strtod(p, &next);
    if (next == p) break;  // non-numeric token
    out[n++] = v;
    p = next;
  }
  return n;
}

// Count whitespace-separated tokens (for pre-sizing the output array).
int64_t pysfm_count_tokens(const char* buf, int64_t len) {
  int64_t n = 0;
  bool in_tok = false;
  for (int64_t i = 0; i < len; ++i) {
    char c = buf[i];
    bool ws = (c == ' ' || c == '\n' || c == '\r' || c == '\t');
    if (!ws && !in_tok) ++n;
    in_tok = !ws;
  }
  return n;
}

}  // extern "C"

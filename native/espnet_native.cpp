// espnet_tpu native runtime helpers.
//
// Replaces the reference's external C tooling on the host side
// (SURVEY.md §2.5): sclite's Levenshtein alignment (tools/Makefile:104)
// and sph2pipe/sox-style PCM decoding. Exposed via a plain C ABI and
// loaded from Python with ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC espnet_native.cpp -o libespnet_native.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Levenshtein alignment with error-type counts.
// ref/hyp: int32 token id arrays. out[4] = {sub, del, ins, ref_len}.
void edit_distance_i32(const int32_t* ref, int64_t n_ref,
                       const int32_t* hyp, int64_t n_hyp,
                       int64_t* out) {
  const int64_t m = n_hyp;
  // rows of (cost, sub, del, ins)
  std::vector<int64_t> prev(4 * (m + 1)), cur(4 * (m + 1));
  for (int64_t j = 0; j <= m; ++j) {
    prev[4 * j + 0] = j;  // cost
    prev[4 * j + 1] = 0;
    prev[4 * j + 2] = 0;
    prev[4 * j + 3] = j;  // insertions
  }
  for (int64_t i = 1; i <= n_ref; ++i) {
    cur[0] = i; cur[1] = 0; cur[2] = i; cur[3] = 0;
    for (int64_t j = 1; j <= m; ++j) {
      int64_t match = (ref[i - 1] == hyp[j - 1]) ? 0 : 1;
      int64_t c_diag = prev[4 * (j - 1)] + match;
      int64_t c_del = prev[4 * j] + 1;
      int64_t c_ins = cur[4 * (j - 1)] + 1;
      if (c_diag <= c_del && c_diag <= c_ins) {
        cur[4 * j + 0] = c_diag;
        cur[4 * j + 1] = prev[4 * (j - 1) + 1] + match;
        cur[4 * j + 2] = prev[4 * (j - 1) + 2];
        cur[4 * j + 3] = prev[4 * (j - 1) + 3];
      } else if (c_del <= c_ins) {
        cur[4 * j + 0] = c_del;
        cur[4 * j + 1] = prev[4 * j + 1];
        cur[4 * j + 2] = prev[4 * j + 2] + 1;
        cur[4 * j + 3] = prev[4 * j + 3];
      } else {
        cur[4 * j + 0] = c_ins;
        cur[4 * j + 1] = cur[4 * (j - 1) + 1];
        cur[4 * j + 2] = cur[4 * (j - 1) + 2];
        cur[4 * j + 3] = cur[4 * (j - 1) + 3] + 1;
      }
    }
    std::swap(prev, cur);
  }
  out[0] = prev[4 * m + 1];
  out[1] = prev[4 * m + 2];
  out[2] = prev[4 * m + 3];
  out[3] = n_ref;
}

// Batched corpus scoring: flattened ref/hyp id streams with offsets.
// outs: per-pair 4 counters (sub, del, ins, ref_len).
void edit_distance_batch_i32(const int32_t* refs, const int64_t* ref_off,
                             const int32_t* hyps, const int64_t* hyp_off,
                             int64_t n_pairs, int64_t* outs) {
  for (int64_t p = 0; p < n_pairs; ++p) {
    edit_distance_i32(refs + ref_off[p], ref_off[p + 1] - ref_off[p],
                      hyps + hyp_off[p], hyp_off[p + 1] - hyp_off[p],
                      outs + 4 * p);
  }
}

// PCM16 little-endian -> float32 in [-1, 1).
void pcm16_to_float(const int16_t* in, int64_t n, float* out) {
  constexpr float kScale = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kScale;
}

// float32 -> PCM16 with clipping.
void float_to_pcm16(const float* in, int64_t n, int16_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i] * 32767.0f;
    v = std::min(32767.0f, std::max(-32768.0f, v));
    out[i] = static_cast<int16_t>(v);
  }
}

}  // extern "C"

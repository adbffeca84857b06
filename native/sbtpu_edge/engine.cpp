// sbtpu_edge engine implementation. See engine.h for the contract and
#include <algorithm>
#include <initializer_list>
// DESIGN.md / model.py for the architecture this mirrors.
#include "engine.h"

#include <cassert>
#include <cmath>
#include <cstring>
#include <fstream>
#include <future>
#include <iostream>
#include <thread>
#include <sstream>
#include <stdexcept>

namespace sbtpu {

namespace {

constexpr float kEps = 1e-6f;     // spatial-feature epsilon
constexpr float kLnEps = 1e-5f;   // layer-norm epsilon

// Rational tanh approximation (the classic Eigen/XLA fast-tanh polynomial;
// XLA lowers tanh/logistic on CPU the same way, so this KEEPS numerical
// parity with the JAX reference while vectorizing: libm exp/tanh calls were
// ~835k per production chunk and dominated the step time).
inline float fast_tanh(float x) {
  x = std::min(std::max(x, -7.90531110763549805f), 7.90531110763549805f);
  const float x2 = x * x;
  float p = -2.76076847742355e-16f;
  p = p * x2 + 2.00018790482477e-13f;
  p = p * x2 + -8.60467152213735e-11f;
  p = p * x2 + 5.12229709037114e-08f;
  p = p * x2 + 1.48572235717979e-05f;
  p = p * x2 + 6.37261928875436e-04f;
  p = p * x2 + 4.89352455891786e-03f;
  p *= x;
  float q = 1.19825839466702e-06f;
  q = q * x2 + 1.18534705686654e-04f;
  q = q * x2 + 2.26843463243900e-03f;
  q = q * x2 + 4.89352518554385e-03f;
  return p / q;
}

inline float sigmoidf(float x) { return 0.5f * fast_tanh(0.5f * x) + 0.5f; }

#if defined(__AVX512F__) && defined(__AVX512VNNI__)
#define SBTPU_INT8 1
#endif

#if defined(__AVX512F__)
#include <immintrin.h>

// 16-lane fast_tanh (same rational polynomial as the scalar form above, so
// vector and scalar paths stay bit-identical per lane)
inline __m512 tanh_v(__m512 x) {
  const __m512 cap = _mm512_set1_ps(7.90531110763549805f);
  x = _mm512_min_ps(_mm512_max_ps(x, _mm512_sub_ps(_mm512_setzero_ps(), cap)),
                    cap);
  const __m512 x2 = _mm512_mul_ps(x, x);
  __m512 p = _mm512_set1_ps(-2.76076847742355e-16f);
  p = _mm512_fmadd_ps(p, x2, _mm512_set1_ps(2.00018790482477e-13f));
  p = _mm512_fmadd_ps(p, x2, _mm512_set1_ps(-8.60467152213735e-11f));
  p = _mm512_fmadd_ps(p, x2, _mm512_set1_ps(5.12229709037114e-08f));
  p = _mm512_fmadd_ps(p, x2, _mm512_set1_ps(1.48572235717979e-05f));
  p = _mm512_fmadd_ps(p, x2, _mm512_set1_ps(6.37261928875436e-04f));
  p = _mm512_fmadd_ps(p, x2, _mm512_set1_ps(4.89352455891786e-03f));
  p = _mm512_mul_ps(p, x);
  __m512 q = _mm512_set1_ps(1.19825839466702e-06f);
  q = _mm512_fmadd_ps(q, x2, _mm512_set1_ps(1.18534705686654e-04f));
  q = _mm512_fmadd_ps(q, x2, _mm512_set1_ps(2.26843463243900e-03f));
  q = _mm512_fmadd_ps(q, x2, _mm512_set1_ps(4.89352518554385e-03f));
  return _mm512_div_ps(p, q);
}

inline __m512 sigmoid_v(__m512 x) {
  const __m512 half = _mm512_set1_ps(0.5f);
  return _mm512_fmadd_ps(tanh_v(_mm512_mul_ps(half, x)), half, half);
}

// vectorized LSTM gate sweep: gates[4H] (i,f,g,o blocks) + state h,c[H].
// Requires H % 16 == 0 (returns false otherwise -> scalar fallback).
inline bool lstm_gates_v(float* __restrict gates, float* __restrict h,
                         float* __restrict c, int H) {
  if (H % 16 != 0) return false;
  for (int j = 0; j < H; j += 16) {
    const __m512 ig = sigmoid_v(_mm512_loadu_ps(gates + j));
    const __m512 fg = sigmoid_v(_mm512_loadu_ps(gates + H + j));
    const __m512 gg = tanh_v(_mm512_loadu_ps(gates + 2 * H + j));
    const __m512 og = sigmoid_v(_mm512_loadu_ps(gates + 3 * H + j));
    const __m512 cn = _mm512_fmadd_ps(fg, _mm512_loadu_ps(c + j),
                                      _mm512_mul_ps(ig, gg));
    _mm512_storeu_ps(c + j, cn);
    _mm512_storeu_ps(h + j, _mm512_mul_ps(og, tanh_v(cn)));
  }
  return true;
}
#else
inline bool lstm_gates_v(float*, float*, float*, int) { return false; }
#endif

#if defined(__AVX512F__)
// One output row y[NV*16] = init + x[m] @ w[m][NV*16], with the WHOLE row
// held in zmm registers across the k loop (the scalar form re-streams the
// accumulator row through L1 on every k — 3 memory ops per FMA; this does 1).
template <int NV>
inline void row_gemv_zmm(const float* __restrict x, const float* __restrict w,
                         const float* __restrict init, float* __restrict y,
                         int m, int n) {
  __m512 acc[NV];
  for (int v = 0; v < NV; ++v)
    acc[v] = init ? _mm512_loadu_ps(init + v * 16) : _mm512_setzero_ps();
  for (int k = 0; k < m; ++k) {
    const __m512 xv = _mm512_set1_ps(x[k]);
    const float* __restrict wk = w + static_cast<size_t>(k) * n;
    for (int v = 0; v < NV; ++v)
      acc[v] = _mm512_fmadd_ps(xv, _mm512_loadu_ps(wk + v * 16), acc[v]);
  }
  for (int v = 0; v < NV; ++v) _mm512_storeu_ps(y + v * 16, acc[v]);
}

// runtime-n dispatcher (n = 16..256, multiple of 16)
inline bool row_gemv_dispatch(const float* x, const float* w,
                              const float* init, float* y, int m, int n) {
  switch (n / 16) {
    case 1: row_gemv_zmm<1>(x, w, init, y, m, n); return true;
    case 2: row_gemv_zmm<2>(x, w, init, y, m, n); return true;
    case 3: row_gemv_zmm<3>(x, w, init, y, m, n); return true;
    case 4: row_gemv_zmm<4>(x, w, init, y, m, n); return true;
    case 6: row_gemv_zmm<6>(x, w, init, y, m, n); return true;
    case 8: row_gemv_zmm<8>(x, w, init, y, m, n); return true;
    case 12: row_gemv_zmm<12>(x, w, init, y, m, n); return true;
    case 16: row_gemv_zmm<16>(x, w, init, y, m, n); return true;
    default: return false;
  }
}
#else
inline bool row_gemv_dispatch(const float*, const float*, const float*,
                              float*, int, int) { return false; }
#endif

// ---------------------------------------------------------------- int8 ----
// Dynamic-quantized GEMV (the reference deploys torch.quantization.
// quantize_dynamic LSTM/Linear, edge/to_onnx.py:150-160; this is the same
// scheme natively): weights are per-output-column symmetric int8, the
// activation row is quantized on the fly to u8 (zero-point 128), products
// accumulate in int32 via vpdpbusd (4 MACs/lane/instr = 4x f32 FMA peak).
#ifdef SBTPU_INT8
// quantize one activation row to u8 (zero-point 128); returns the scale
inline float quantize_row_u8(const float* __restrict x, int m,
                             uint8_t* __restrict xq) {
  const int mp = (m + 3) & ~3;
  int k = 0;
  __m512 vmax = _mm512_setzero_ps();
  for (; k + 16 <= m; k += 16)
    vmax = _mm512_max_ps(vmax, _mm512_abs_ps(_mm512_loadu_ps(x + k)));
  float mx = _mm512_reduce_max_ps(vmax);
  for (; k < m; ++k) mx = std::max(mx, std::abs(x[k]));
  if (mx == 0) {
    std::memset(xq, 128, mp);
    return 0.0f;
  }
  const float inv = 127.0f / mx;
  const __m512 vinv = _mm512_set1_ps(inv);
  const __m512i v128 = _mm512_set1_epi32(128);
  for (k = 0; k + 16 <= m; k += 16) {
    // round-to-nearest-even == lrintf; results land in [1, 255] so the
    // unsigned-saturating narrow is exact
    __m512i vi = _mm512_add_epi32(
        _mm512_cvtps_epi32(_mm512_mul_ps(_mm512_loadu_ps(x + k), vinv)),
        v128);
    _mm_storeu_si128(reinterpret_cast<__m128i*>(xq + k),
                     _mm512_cvtusepi32_epi8(vi));
  }
  for (; k < m; ++k) {
    int v = static_cast<int>(std::lrintf(x[k] * inv)) + 128;
    xq[k] = static_cast<uint8_t>(std::min(std::max(v, 0), 255));
  }
  for (k = m; k < mp; ++k) xq[k] = 128;  // padded weights are zero
  return mx / 127.0f;
}

// y[n] = (xq @ qpack) * (sx*scale) + init  (init==y for accumulate)
inline void gemv_q(const uint8_t* __restrict xq, const Tensor& w,
                   float sx, const float* __restrict init,
                   float* __restrict y, int m, int n) {
  if (sx == 0.0f) {
    if (init != y) {
      if (init) std::memcpy(y, init, n * sizeof(float));
      else std::memset(y, 0, n * sizeof(float));
    }
    return;
  }
  const int groups = (m + 3) / 4;
  const int8_t* __restrict wp0 = w.qpack.data();
  // epilogue shared by the 4-tile and 1-tile paths
  auto finish = [&](__m512i acc, int j0) {
    // remove the u8 zero-point: acc -= 128 * colsum
    const __m512i cs = _mm512_loadu_si512(
        reinterpret_cast<const void*>(w.colsum.data() + j0));
    acc = _mm512_sub_epi32(acc, _mm512_slli_epi32(cs, 7));
    const __m512 sc = _mm512_mul_ps(_mm512_set1_ps(sx),
                                    _mm512_loadu_ps(w.scales.data() + j0));
    const __m512 base = init ? _mm512_loadu_ps(init + j0)
                             : _mm512_setzero_ps();
    _mm512_storeu_ps(y + j0, _mm512_fmadd_ps(_mm512_cvtepi32_ps(acc), sc,
                                             base));
  };
  // Multi-tile passes: vpdpbusd has ~5-cycle latency, so a single
  // accumulator's g-chain runs latency-bound (~m/4 x 5 cycles); K
  // independent column-tile accumulators sharing each broadcast activation
  // word keep the VNNI port fed, and the K tile rows are one contiguous
  // 64K-byte weight stream. 8 tiles (128 outputs) makes the H=64 gate
  // GEMV (16-deep chain) throughput-bound; a 4-tile pass mops up.
  int j0 = 0;
  for (; j0 + 128 <= n; j0 += 128) {
    __m512i a[8];
    for (auto& v : a) v = _mm512_setzero_si512();
    const int8_t* __restrict wp = wp0 + j0 * 4;
    for (int g = 0; g < groups; ++g) {
      int xw;
      std::memcpy(&xw, xq + 4 * g, 4);
      const __m512i xv = _mm512_set1_epi32(xw);
      const int8_t* __restrict wg = wp + static_cast<size_t>(g) * n * 4;
      for (int k = 0; k < 8; ++k)
        a[k] = _mm512_dpbusd_epi32(
            a[k], xv,
            _mm512_loadu_si512(
                reinterpret_cast<const void*>(wg + 64 * k)));
    }
    for (int k = 0; k < 8; ++k) finish(a[k], j0 + 16 * k);
  }
  for (; j0 + 64 <= n; j0 += 64) {
    __m512i a[4];
    for (auto& v : a) v = _mm512_setzero_si512();
    const int8_t* __restrict wp = wp0 + j0 * 4;
    for (int g = 0; g < groups; ++g) {
      int xw;
      std::memcpy(&xw, xq + 4 * g, 4);
      const __m512i xv = _mm512_set1_epi32(xw);
      const int8_t* __restrict wg = wp + static_cast<size_t>(g) * n * 4;
      for (int k = 0; k < 4; ++k)
        a[k] = _mm512_dpbusd_epi32(
            a[k], xv,
            _mm512_loadu_si512(
                reinterpret_cast<const void*>(wg + 64 * k)));
    }
    for (int k = 0; k < 4; ++k) finish(a[k], j0 + 16 * k);
  }
  for (; j0 < n; j0 += 16) {
    __m512i acc = _mm512_setzero_si512();
    const int8_t* __restrict wp = wp0 + j0 * 4;
    for (int g = 0; g < groups; ++g) {
      int xw;
      std::memcpy(&xw, xq + 4 * g, 4);
      const __m512i xv = _mm512_set1_epi32(xw);
      const __m512i wv = _mm512_loadu_si512(
          reinterpret_cast<const void*>(wp + static_cast<size_t>(g) * n * 4));
      acc = _mm512_dpbusd_epi32(acc, xv, wv);
    }
    finish(acc, j0);
  }
}
#endif  // SBTPU_INT8

// y[F][N] = x[F][M] @ w[M][N] (+ bias[N])
void matmul(const float* __restrict x, const float* __restrict w,
            const float* __restrict bias, float* __restrict y,
            int f, int m, int n) {
  if (n % 16 == 0 && n <= 256) {
    bool ok = true;
    for (int i = 0; i < f && ok; ++i)
      ok = row_gemv_dispatch(x + i * m, w, bias, y + i * n, m, n);
    if (ok) return;
  }
  for (int i = 0; i < f; ++i) {
    float* __restrict yi = y + i * n;
    if (bias) {
      std::memcpy(yi, bias, n * sizeof(float));
    } else {
      std::memset(yi, 0, n * sizeof(float));
    }
    const float* __restrict xi = x + i * m;
    for (int k = 0; k < m; ++k) {
      const float xv = xi[k];
      if (xv == 0.0f) continue;  // measured faster (padded/gated zeros)
      const float* __restrict wk = w + k * n;
      for (int j = 0; j < n; ++j) yi[j] += xv * wk[j];
    }
  }
}

// in-place layer norm over trailing dim n with affine params
void layer_norm(float* x, const float* scale, const float* bias, int rows,
                int n) {
  for (int i = 0; i < rows; ++i) {
    float* xi = x + i * n;
    float mu = 0;
    for (int j = 0; j < n; ++j) mu += xi[j];
    mu /= n;
    float var = 0;
    for (int j = 0; j < n; ++j) {
      const float d = xi[j] - mu;
      var += d * d;
    }
    var /= n;
    const float inv = 1.0f / std::sqrt(var + kLnEps);
    for (int j = 0; j < n; ++j) xi[j] = (xi[j] - mu) * inv * scale[j] + bias[j];
  }
}

void prelu(float* x, float alpha, int n) {
  for (int i = 0; i < n; ++i)
    x[i] = x[i] > 0 ? x[i] : alpha * x[i];
}

// y[F][N] += x[F][M] @ w[M][N] (accumulate; no zero-skip branches)
void matmul_acc(const float* __restrict x, const float* __restrict w,
                float* __restrict y, int f, int m, int n) {
  if (n % 16 == 0 && n <= 256) {
    bool ok = true;
    for (int i = 0; i < f && ok; ++i)
      ok = row_gemv_dispatch(x + i * m, w, y + i * n, y + i * n, m, n);
    if (ok) return;
  }
  for (int i = 0; i < f; ++i) {
    float* __restrict yi = y + i * n;
    const float* __restrict xi = x + i * m;
    for (int k = 0; k < m; ++k) {
      const float xv = xi[k];
      const float* __restrict wk = w + k * n;
      for (int j = 0; j < n; ++j) yi[j] += xv * wk[j];
    }
  }
}

// Vectorized gate nonlinearity + state update for `rows` independent LSTM
// lanes: gates[rows][4H] already holds x@w_ih + h@w_hh + b.
void lstm_activate(float* __restrict gates, float* __restrict h,
                   float* __restrict c, int rows, int H) {
  for (int r = 0; r < rows; ++r) {
    float* g = gates + r * 4 * H;
    float* hr = h + r * H;
    float* cr = c + r * H;
    if (lstm_gates_v(g, hr, cr, H)) continue;
    for (int j = 0; j < H; ++j) {
      const float ig = sigmoidf(g[j]);
      const float fg = sigmoidf(g[H + j]);
      const float gg = fast_tanh(g[2 * H + j]);
      const float og = sigmoidf(g[3 * H + j]);
      cr[j] = fg * cr[j] + ig * gg;
      hr[j] = og * fast_tanh(cr[j]);
    }
  }
}

// One LSTM cell update. gates[4H] = xproj (modified in place with +h@w_hh).
// Gate order i,f,g,o (torch). h,c: [H].
void lstm_cell(float* __restrict gates, const float* __restrict w_hh,
               float* __restrict h, float* __restrict c, int H) {
  if (!(4 * H % 16 == 0 && 4 * H <= 256
        && row_gemv_dispatch(h, w_hh, gates, gates, H, 4 * H))) {
    for (int k = 0; k < H; ++k) {
      const float hv = h[k];
      if (hv == 0.0f) continue;
      const float* __restrict wk = w_hh + k * 4 * H;
      for (int j = 0; j < 4 * H; ++j) gates[j] += hv * wk[j];
    }
  }
  for (int j = 0; j < H; ++j) {
    const float ig = sigmoidf(gates[j]);
    const float fg = sigmoidf(gates[H + j]);
    const float gg = fast_tanh(gates[2 * H + j]);
    const float og = sigmoidf(gates[3 * H + j]);
    c[j] = fg * c[j] + ig * gg;
    h[j] = og * fast_tanh(c[j]);
  }
}

// Tensor-aware dispatchers: int8 fast path when the tensor kept its
// quantized payload, f32 otherwise. Shapes as in matmul()/matmul_acc().
// quantize_row_u8 writes (m+3)&~3 bytes; rows beyond the stack scratch go
// to a heap buffer instead of smashing the stack (m is config-driven:
// e.g. conv_lstm down-proj m = lstm_down*D, intra proj m = 2H).
constexpr int kQuantStackBytes = 1024;

void mm(const float* x, const Tensor& w, const float* bias, float* y,
        int f, int m, int n) {
#ifdef SBTPU_INT8
  if (w.quant) {
    alignas(64) uint8_t xq_s[kQuantStackBytes];
    std::vector<uint8_t> xq_h;
    uint8_t* xq = xq_s;
    if (((m + 3) & ~3) > kQuantStackBytes) {
      xq_h.resize((m + 3) & ~3);
      xq = xq_h.data();
    }
    for (int i = 0; i < f; ++i) {
      const float sx = quantize_row_u8(x + i * m, m, xq);
      gemv_q(xq, w, sx, bias, y + i * n, m, n);
    }
    return;
  }
#endif
  matmul(x, w.data.data(), bias, y, f, m, n);
}

void mm_acc(const float* x, const Tensor& w, float* y, int f, int m, int n) {
#ifdef SBTPU_INT8
  if (w.quant) {
    alignas(64) uint8_t xq_s[kQuantStackBytes];
    std::vector<uint8_t> xq_h;
    uint8_t* xq = xq_s;
    if (((m + 3) & ~3) > kQuantStackBytes) {
      xq_h.resize((m + 3) & ~3);
      xq = xq_h.data();
    }
    for (int i = 0; i < f; ++i) {
      const float sx = quantize_row_u8(x + i * m, m, xq);
      gemv_q(xq, w, sx, y + i * n, y + i * n, m, n);
    }
    return;
  }
#endif
  matmul_acc(x, w.data.data(), y, f, m, n);
}

// LSTM cell with a Tensor recurrent matrix (int8 aware).
void lstm_cell_t(float* __restrict gates, const Tensor& w_hh,
                 float* __restrict h, float* __restrict c, int H) {
#ifdef SBTPU_INT8
  if (w_hh.quant) {
    alignas(64) uint8_t xq_s[kQuantStackBytes];
    std::vector<uint8_t> xq_h;
    uint8_t* xq = xq_s;
    if (((H + 3) & ~3) > kQuantStackBytes) {
      xq_h.resize((H + 3) & ~3);
      xq = xq_h.data();
    }
    const float sx = quantize_row_u8(h, H, xq);
    gemv_q(xq, w_hh, sx, gates, gates, H, 4 * H);
    if (lstm_gates_v(gates, h, c, H)) return;
    for (int j = 0; j < H; ++j) {
      const float ig = sigmoidf(gates[j]);
      const float fg = sigmoidf(gates[H + j]);
      const float gg = fast_tanh(gates[2 * H + j]);
      const float og = sigmoidf(gates[3 * H + j]);
      c[j] = fg * c[j] + ig * gg;
      h[j] = og * fast_tanh(c[j]);
    }
    return;
  }
#endif
  lstm_cell(gates, w_hh.data.data(), h, c, H);
}

std::string json_str(const std::string& body, const std::string& key) {
  auto p = body.find("\"" + key + "\"");
  if (p == std::string::npos) return "";
  p = body.find(':', p) + 1;
  while (p < body.size() && (body[p] == ' ' || body[p] == '\n')) ++p;
  if (body[p] == '"') {
    auto e = body.find('"', p + 1);
    return body.substr(p + 1, e - p - 1);
  }
  auto e = body.find_first_of(",}\n", p);
  std::string v = body.substr(p, e - p);
  while (!v.empty() && (v.back() == ' ' || v.back() == '\r')) v.pop_back();
  return v;
}

int json_int(const std::string& body, const std::string& key, int dflt) {
  auto v = json_str(body, key);
  return v.empty() ? dflt : std::stoi(v);
}

bool json_bool(const std::string& body, const std::string& key, bool dflt) {
  auto v = json_str(body, key);
  if (v.empty()) return dflt;
  return v == "true" || v == "True" || v == "1";
}

}  // namespace

int Config::embed_width() const {
  if (dis_type == "linear1" || dis_type == "conv1") return 1;
  if (dis_type == "conv2") return 2;
  if (dis_type == "conv3") return 4;
  if (dis_type == "conv4") return 8;
  return D;  // linear2
}

Engine::Engine(const std::string& model_dir) {
  // ---- config ----
  std::ifstream cf(model_dir + "/model_config.json");
  if (!cf) throw std::runtime_error("missing model_config.json");
  std::stringstream ss;
  ss << cf.rdbuf();
  const std::string body = ss.str();
  cfg_.stft_chunk_size = json_int(body, "stft_chunk_size", 192);
  cfg_.stft_pad_size = json_int(body, "stft_pad_size", 96);
  cfg_.stft_back_pad = json_int(body, "stft_back_pad", 0);
  cfg_.num_ch = json_int(body, "num_ch", 6);
  cfg_.D = json_int(body, "D", 32);
  cfg_.B = json_int(body, "B", 6);
  cfg_.H = json_int(body, "H", 64);
  cfg_.L = json_int(body, "L", 4);
  cfg_.E = json_int(body, "E", 2);
  cfg_.use_attn = json_bool(body, "use_attn", false);
  cfg_.local_atten_len = json_int(body, "local_atten_len", 100);
  cfg_.conv_lstm = json_bool(body, "conv_lstm", false);
  cfg_.lstm_down = json_int(body, "lstm_down", 4);
  cfg_.use_first_ln = json_bool(body, "use_first_ln", true);
  cfg_.merge_method = json_str(body, "merge_method");
  cfg_.directional = json_bool(body, "directional", false);
  cfg_.dis_type = json_str(body, "dis_type");
  cfg_.num_src = json_int(body, "num_src", 1);
  cfg_.conditional = json_bool(body, "conditional", true);

  // ---- weights blob ----
  std::ifstream wf(model_dir + "/weights.bin", std::ios::binary);
  if (!wf) throw std::runtime_error("missing weights.bin");
  char magic[8];
  wf.read(magic, 8);
  const bool v2 = std::memcmp(magic, "SBTW0002", 8) == 0;  // int8 weight-only
  if (!v2 && std::memcmp(magic, "SBTW0001", 8) != 0)
    throw std::runtime_error("bad weights magic");
  quantized_ = v2;
  uint32_t count;
  wf.read(reinterpret_cast<char*>(&count), 4);
  for (uint32_t i = 0; i < count; ++i) {
    uint32_t name_len;
    wf.read(reinterpret_cast<char*>(&name_len), 4);
    std::string name(name_len, '\0');
    wf.read(name.data(), name_len);
    uint8_t ndim;
    wf.read(reinterpret_cast<char*>(&ndim), 1);
    Tensor t;
    for (int d = 0; d < ndim; ++d) {
      uint32_t dim;
      wf.read(reinterpret_cast<char*>(&dim), 4);
      t.shape.push_back(static_cast<int>(dim));
    }
    uint8_t dtype = 0;
    std::vector<float> scales;
    if (v2) {
      wf.read(reinterpret_cast<char*>(&dtype), 1);
      if (dtype == 1) {
        uint32_t n_scales;
        wf.read(reinterpret_cast<char*>(&n_scales), 4);
        scales.resize(n_scales);
        wf.read(reinterpret_cast<char*>(scales.data()), n_scales * 4);
      }
    }
    uint32_t nbytes;
    wf.read(reinterpret_cast<char*>(&nbytes), 4);
    if (dtype == 1) {
      // symmetric per-output-channel int8 (minor dim)
      std::vector<int8_t> q(nbytes);
      wf.read(reinterpret_cast<char*>(q.data()), nbytes);
      const size_t n_out = scales.size();
#ifdef SBTPU_INT8
      // keep the quantized payload (vpdpbusd packing) for 2-D GEMV mats;
      // dis_embed.proj is read elementwise in set_dis_embed -> dequantize
      const bool pack = t.shape.size() == 2 && t.shape[1] % 16 == 0 &&
                        static_cast<size_t>(t.shape[1]) == n_out &&
                        name.rfind("dis_embed.", 0) != 0;
      if (pack) {
        const int M = t.shape[0], N = t.shape[1];
        const int G = (M + 3) / 4;
        t.quant = true;
        t.qpack.assign(static_cast<size_t>(G) * N * 4, 0);
        t.colsum.assign(N, 0);
        t.scales = std::move(scales);
        for (int k = 0; k < M; ++k)
          for (int j = 0; j < N; ++j) {
            const int8_t v = q[static_cast<size_t>(k) * N + j];
            t.qpack[(static_cast<size_t>(k / 4) * N + j) * 4 + (k % 4)] = v;
            t.colsum[j] += v;
          }
        w_[name] = std::move(t);
        continue;
      }
#endif
      t.data.resize(nbytes);
      for (size_t e = 0; e < q.size(); ++e)
        t.data[e] = static_cast<float>(q[e]) * scales[e % n_out];
    } else {
      t.data.resize(nbytes / 4);
      wf.read(reinterpret_cast<char*>(t.data.data()), nbytes);
    }
    w_[name] = std::move(t);
  }

  build_filterbank();
  const int F = cfg_.n_freqs();
  scratch_a_.resize(4 * F * std::max({cfg_.conv_in(), 8 * cfg_.H, cfg_.D * 4}));
  scratch_b_.resize(scratch_a_.size());
  scratch_c_.resize(scratch_a_.size());
  scratch_d_.resize(scratch_a_.size());
  float one_hot[3] = {0.f, 0.f, 1.f};
  if (cfg_.conditional) set_dis_embed(one_hot, 3);
  reset();
}

void Engine::build_filterbank() {
  const int N = cfg_.n_fft();
  const int K = N;  // kernel == n_fft
  const int F = cfg_.n_freqs();
  const double scale = 1.0 / (0.5 * std::sqrt(double(K) * N / cfg_.stft_chunk_size));
  filters_.assign(2 * F * K, 0.f);
  for (int k = 0; k < K; ++k) {
    const double hann = 0.5 * (1.0 - std::cos(2.0 * M_PI * k / K));
    const double win = std::sqrt(hann);
    for (int f = 0; f < F; ++f) {
      const double ang = 2.0 * M_PI * f * k / N;
      double re = std::cos(ang) * scale;
      const double im = -std::sin(ang) * scale;
      if (f == 0 || f == N / 2) re /= std::sqrt(2.0);
      filters_[f * K + k] = static_cast<float>(re * win);
      filters_[(F + f) * K + k] = static_cast<float>(im * win);
    }
  }
}

void Engine::set_dis_embed(const float* one_hot, int len) {
  if (!cfg_.conditional) return;
  const int F = cfg_.n_freqs();
  const int d_in = cfg_.embed_width();
  const Tensor& proj = w_.at("dis_embed.proj.kernel");  // [len, F*d_in]
  dis_embed_.assign(F * d_in, 0.f);
  for (int i = 0; i < len; ++i)
    for (int j = 0; j < F * d_in; ++j)
      dis_embed_[j] += one_hot[i] * proj.data[i * F * d_in + j];
  layer_norm(dis_embed_.data(), w_.at("dis_embed.norm.scale").data.data(),
             w_.at("dis_embed.norm.bias").data.data(), F, d_in);
  precompute_film();
}

void Engine::precompute_film() {
  const int F = cfg_.n_freqs();
  const int D = cfg_.D;
  const int d_in = cfg_.embed_width();
  film_w_.assign((cfg_.B - 1) * F * D, 0.f);
  film_b_.assign((cfg_.B - 1) * F * D, 0.f);
  for (int b = 1; b < cfg_.B; ++b) {
    const std::string p = "film" + std::to_string(b - 1) + ".";
    mm(dis_embed_.data(), w_.at(p + "weight.kernel"),
       w_.at(p + "weight.bias").data.data(),
       film_w_.data() + (b - 1) * F * D, F, d_in, D);
    mm(dis_embed_.data(), w_.at(p + "bias.kernel"),
       w_.at(p + "bias.bias").data.data(),
       film_b_.data() + (b - 1) * F * D, F, d_in, D);
  }
}

void Engine::reset() {
  const int F = cfg_.n_freqs();
  conv_buf_.assign(2 * F * cfg_.conv_in(), 0.f);
  deconv_buf_.assign(2 * F * cfg_.D, 0.f);
  istft_buf_.assign(cfg_.num_src * 2 * F, 0.f);
  h_.assign(cfg_.B, std::vector<float>(F * cfg_.H, 0.f));
  c_.assign(cfg_.B, std::vector<float>(F * cfg_.H, 0.f));
  if (cfg_.use_attn) {
    const int W = cfg_.local_atten_len;
    const int vd = cfg_.D / cfg_.L;
    k_ring_.assign(cfg_.B,
                   std::vector<float>(size_t(cfg_.L) * W * F * cfg_.E, 0.f));
    v_ring_.assign(cfg_.B, std::vector<float>(size_t(cfg_.L) * W * F * vd, 0.f));
    attn_pos_ = 0;
  }
}

namespace {
// SBTPU_PROFILE=1: per-section wall time accumulated across steps, dumped
// to stderr every 500 steps.
struct SectionProf {
  bool on = std::getenv("SBTPU_PROFILE") != nullptr;
  double t[6] = {0};
  long n = 0;
  std::chrono::steady_clock::time_point mark;
  void start() { if (on) mark = std::chrono::steady_clock::now(); }
  void lap(int i) {
    if (!on) return;
    auto now = std::chrono::steady_clock::now();
    t[i] += std::chrono::duration<double, std::milli>(now - mark).count();
    mark = now;
  }
  void tick() {
    if (!on || ++n % 500) return;
    static const char* names[6] = {"stft+feat", "conv", "intra", "inter",
                                   "deconv", "istft"};
    std::cerr << "[sbtpu prof] per chunk:";
    for (int i = 0; i < 6; ++i)
      std::cerr << " " << names[i] << "=" << t[i] / n << "ms";
    std::cerr << std::endl;
  }
};
SectionProf g_prof;
}  // namespace

void Engine::step(const float* mix, float* out) {
  g_prof.start();
  const int F = cfg_.n_freqs();
  const int K = cfg_.n_fft();
  const int M = cfg_.num_ch;
  const int D = cfg_.D;
  const int H = cfg_.H;
  const int Cin = cfg_.conv_in();

  // ---- STFT: spec[m][2F] ----
  std::vector<float> spec(M * 2 * F);
  for (int m = 0; m < M; ++m)
    for (int f2 = 0; f2 < 2 * F; ++f2) {
      const float* filt = filters_.data() + f2 * K;
      const float* x = mix + m * K;
      float acc = 0;
      for (int k = 0; k < K; ++k) acc += filt[k] * x[k];
      spec[m * 2 * F + f2] = acc;
    }

  // ---- features: feat[F][Cin] ----
  std::vector<float> feat(F * Cin);
  auto re = [&](int m, int f) { return spec[m * 2 * F + f]; };
  auto im = [&](int m, int f) { return spec[m * 2 * F + F + f]; };
  for (int f = 0; f < F; ++f) {
    float* row = feat.data() + f * Cin;
    for (int m = 0; m < M; ++m) {
      row[m] = re(m, f);
      row[M + m] = im(m, f);
    }
    if (cfg_.merge_method == "early_cat") {
      float norm[16];
      for (int m = 0; m < M; ++m)
        norm[m] = std::sqrt(re(m, f) * re(m, f) + im(m, f) * im(m, f));
      int ch = 2 * M;
      if (cfg_.directional) {
        row[ch++] = std::log10((norm[2] + kEps) / (norm[3] + kEps));
        const int sel[3] = {1, 4, 5};
        for (int s : sel)
          row[ch++] = std::log10((norm[s] + kEps) / (norm[0] + kEps));
      } else {
        for (int m = 1; m < M; ++m)
          row[ch++] = std::log10((norm[m] + kEps) / (norm[0] + kEps));
      }
      for (int m = 1; m < M; ++m) {
        const float denom = norm[m] * norm[0] + kEps;
        const float cosv = (re(m, f) * re(0, f) + im(m, f) * im(0, f)) / denom;
        const float sinv = (re(0, f) * im(m, f) - im(0, f) * re(m, f)) / denom;
        row[ch++] = sinv;
        row[ch++] = cosv;
      }
    }
  }

  g_prof.lap(0);
  // ---- causal conv 3x3 over [conv_buf ++ feat] ----
  const Tensor& wc = w_.at("conv.kernel");  // [3][3][Cin][D]
  const Tensor& bc = w_.at("conv.bias");
  std::vector<float> h(F * D);
  const float* frames[3] = {conv_buf_.data(), conv_buf_.data() + F * Cin,
                            feat.data()};
  for (int f = 0; f < F; ++f) {
    float* hf = h.data() + f * D;
    std::memcpy(hf, bc.data.data(), D * sizeof(float));
    for (int dt = 0; dt < 3; ++dt)
      for (int df = -1; df <= 1; ++df) {
        const int ff = f + df;
        if (ff < 0 || ff >= F) continue;
        const float* in = frames[dt] + ff * Cin;
        const float* wk = wc.data.data() + ((dt * 3) + (df + 1)) * Cin * D;
        for (int i = 0; i < Cin; ++i) {
          const float xv = in[i];
          if (xv == 0.0f) continue;
          const float* wrow = wk + i * D;
          for (int o = 0; o < D; ++o) hf[o] += xv * wrow[o];
        }
      }
  }
  // roll conv state
  std::memcpy(conv_buf_.data(), conv_buf_.data() + F * Cin,
              F * Cin * sizeof(float));
  std::memcpy(conv_buf_.data() + F * Cin, feat.data(), F * Cin * sizeof(float));

  if (cfg_.use_first_ln)
    layer_norm(h.data(), w_.at("first_ln.scale").data.data(),
               w_.at("first_ln.bias").data.data(), F, D);

  g_prof.lap(1);
  // ---- GridNet blocks ----
  std::vector<float> z(F * std::max(D, 2 * H));
  std::vector<float> xp_f(F * 4 * H), xp_b(F * 4 * H), y2h(F * 2 * H);
  std::vector<float> hh(H), cc(H);
  for (int b = 0; b < cfg_.B; ++b) {
    const std::string p = "block" + std::to_string(b) + ".";
    if (b > 0 && cfg_.conditional) {
      const float* fw = film_w_.data() + (b - 1) * F * D;
      const float* fb = film_b_.data() + (b - 1) * F * D;
      for (int i = 0; i < F * D; ++i) h[i] = h[i] * fw[i] + fb[i];
    }

    // intra: BLSTM (or conv-BLSTM) across frequency
    if (!cfg_.conv_lstm) {
      std::memcpy(z.data(), h.data(), F * D * sizeof(float));
      layer_norm(z.data(), w_.at(p + "intra.norm.scale").data.data(),
                 w_.at(p + "intra.norm.bias").data.data(), F, D);
      mm(z.data(), w_.at(p + "intra.blstm.fwd.w_ih"),
         w_.at(p + "intra.blstm.fwd.b").data.data(), xp_f.data(), F, D,
         4 * H);
      mm(z.data(), w_.at(p + "intra.blstm.bwd.w_ih"),
         w_.at(p + "intra.blstm.bwd.b").data.data(), xp_b.data(), F, D,
         4 * H);
      const Tensor& whh_f = w_.at(p + "intra.blstm.fwd.w_hh");
      const Tensor& whh_b = w_.at(p + "intra.blstm.bwd.w_hh");
      // the two directions are independent: run them concurrently when the
      // machine has spare cores; on a single hardware thread the async
      // spawn is pure overhead
      static const bool parallel_dirs =
          std::thread::hardware_concurrency() > 1;
      auto run_fwd = [&] {
        float h1[512] = {0}, c1[512] = {0};
        for (int f = 0; f < F; ++f) {
          lstm_cell_t(xp_f.data() + f * 4 * H, whh_f, h1, c1, H);
          std::memcpy(y2h.data() + f * 2 * H, h1, H * sizeof(float));
        }
      };
      std::future<void> fwd_job;
      if (parallel_dirs) fwd_job = std::async(std::launch::async, run_fwd);
      if (parallel_dirs) {
        float h1[512] = {0}, c1[512] = {0};
        for (int f = F - 1; f >= 0; --f) {
          lstm_cell_t(xp_b.data() + f * 4 * H, whh_b, h1, c1, H);
          std::memcpy(y2h.data() + f * 2 * H + H, h1, H * sizeof(float));
        }
        fwd_job.wait();
      } else {
        // single hardware thread: interleave the two independent
        // dependency chains so the core's OoO window sees twice the
        // independent FMA work per cycle
        float hf[512] = {0}, cf[512] = {0}, hb[512] = {0}, cb[512] = {0};
        for (int f = 0; f < F; ++f) {
          const int fb = F - 1 - f;
          lstm_cell_t(xp_f.data() + f * 4 * H, whh_f, hf, cf, H);
          lstm_cell_t(xp_b.data() + fb * 4 * H, whh_b, hb, cb, H);
          std::memcpy(y2h.data() + f * 2 * H, hf, H * sizeof(float));
          std::memcpy(y2h.data() + fb * 2 * H + H, hb, H * sizeof(float));
        }
      }
      mm(y2h.data(), w_.at(p + "intra.proj.kernel"),
         w_.at(p + "intra.proj.bias").data.data(), z.data(), F, 2 * H, D);
      for (int i = 0; i < F * D; ++i) h[i] += z[i];
    } else {
      const int s = cfg_.lstm_down;
      const int kk = F / s;
      // strided frame + down projection: [kk][s*D] @ [s*D][D]
      std::vector<float> down(kk * D);
      mm(h.data(), w_.at(p + "intra.down.kernel"),
         w_.at(p + "intra.down.bias").data.data(), down.data(), kk,
         s * D, D);
      prelu(down.data(), w_.at(p + "intra.act.alpha").data[0], kk * D);
      layer_norm(down.data(), w_.at(p + "intra.norm.scale").data.data(),
                 w_.at(p + "intra.norm.bias").data.data(), kk, D);
      mm(down.data(), w_.at(p + "intra.blstm.fwd.w_ih"),
         w_.at(p + "intra.blstm.fwd.b").data.data(), xp_f.data(), kk, D,
         4 * H);
      mm(down.data(), w_.at(p + "intra.blstm.bwd.w_ih"),
         w_.at(p + "intra.blstm.bwd.b").data.data(), xp_b.data(), kk, D,
         4 * H);
      const Tensor& whh_f = w_.at(p + "intra.blstm.fwd.w_hh");
      const Tensor& whh_b = w_.at(p + "intra.blstm.bwd.w_hh");
      std::fill(hh.begin(), hh.end(), 0.f);
      std::fill(cc.begin(), cc.end(), 0.f);
      for (int t = 0; t < kk; ++t) {
        lstm_cell_t(xp_f.data() + t * 4 * H, whh_f, hh.data(), cc.data(), H);
        std::memcpy(y2h.data() + t * 2 * H, hh.data(), H * sizeof(float));
      }
      std::fill(hh.begin(), hh.end(), 0.f);
      std::fill(cc.begin(), cc.end(), 0.f);
      for (int t = kk - 1; t >= 0; --t) {
        lstm_cell_t(xp_b.data() + t * 4 * H, whh_b, hh.data(), cc.data(), H);
        std::memcpy(y2h.data() + t * 2 * H + H, hh.data(), H * sizeof(float));
      }
      // transposed-conv upsample: out[t*s+j][c] = sum_h y[t][h] wu[h][j][c]
      const Tensor& wu = w_.at(p + "intra.up_kernel");  // [2H][s][D]
      const Tensor& bu = w_.at(p + "intra.up_bias");
      std::fill(z.begin(), z.begin() + F * D, 0.f);
      for (int t = 0; t < kk; ++t)
        for (int j = 0; j < s; ++j) {
          const int f = t * s + j;
          if (f >= F) break;
          float* zf = z.data() + f * D;
          std::memcpy(zf, bu.data.data(), D * sizeof(float));
          const float* yt = y2h.data() + t * 2 * H;
          for (int hidx = 0; hidx < 2 * H; ++hidx) {
            const float yv = yt[hidx];
            if (yv == 0.0f) continue;
            const float* wrow = wu.data.data() + (hidx * s + j) * D;
            for (int cidx = 0; cidx < D; ++cidx) zf[cidx] += yv * wrow[cidx];
          }
        }
      // rows beyond kk*s stay zero (reference pad-then-trim semantics)
      for (int i = 0; i < F * D; ++i) h[i] += z[i];
    }

    g_prof.lap(2);
    // inter: one stateful LSTM step per frequency
    std::memcpy(z.data(), h.data(), F * D * sizeof(float));
    layer_norm(z.data(), w_.at(p + "inter_norm.scale").data.data(),
               w_.at(p + "inter_norm.bias").data.data(), F, D);
    mm(z.data(), w_.at(p + "inter_lstm.w_ih"),
       w_.at(p + "inter_lstm.b").data.data(), xp_f.data(), F, D, 4 * H);
    const Tensor& whh = w_.at(p + "inter_lstm.w_hh");
    // the F frequency lanes are independent: one [F,H]x[H,4H] GEMM for the
    // recurrent projection instead of F tiny GEMVs, then a vectorized
    // activation sweep
    mm_acc(h_[b].data(), whh, xp_f.data(), F, H, 4 * H);
    lstm_activate(xp_f.data(), h_[b].data(), c_[b].data(), F, H);
    // reuse y2h as [F][H] holder of new hidden states
    mm(h_[b].data(), w_.at(p + "inter_proj.kernel"),
       w_.at(p + "inter_proj.bias").data.data(), z.data(), F, H, D);
    for (int i = 0; i < F * D; ++i) h[i] += z[i];

    // local causal attention (model.py GridNetBlock use_attn branch):
    // Q/K/V = Linear -> PReLU -> head split -> LN over F*e; the current K/V
    // frame joins a W-slot ring (== [K_buf, k_new]); one softmax-weighted
    // sum per head over all W frames; out proj -> PReLU -> LN(F*D) residual.
    if (cfg_.use_attn) {
      const int L = cfg_.L, E = cfg_.E, vd = D / L;
      const int W = cfg_.local_atten_len;
      auto qkv = [&](const char* name, int e, float* head_major) {
        // h[F][D] -> heads[L][F*e] (f-major, e-minor per head), LN per head
        const std::string q = p + name;
        std::vector<float> zz(F * L * e);
        // Tensor-aware mm(): the proj kernels hit the int8 pack condition
        // (shape[1] = L*e or D, %16==0) — raw w.data would be empty
        mm(h.data(), w_.at(q + ".proj.kernel"),
           w_.at(q + ".proj.bias").data.data(), zz.data(), F, D, L * e);
        prelu(zz.data(), w_.at(q + ".act.alpha").data[0], F * L * e);
        for (int l = 0; l < L; ++l)
          for (int f = 0; f < F; ++f)
            std::memcpy(head_major + (size_t(l) * F + f) * e,
                        zz.data() + (size_t(f) * L + l) * e,
                        e * sizeof(float));
        layer_norm(head_major, w_.at(q + ".norm.scale").data.data(),
                   w_.at(q + ".norm.bias").data.data(), L, F * e);
      };
      std::vector<float> qh(size_t(L) * F * E), kh(size_t(L) * F * E);
      std::vector<float> vh(size_t(L) * F * vd);
      qkv("attn_q", E, qh.data());
      qkv("attn_k", E, kh.data());
      qkv("attn_v", vd, vh.data());

      const int dk = F * E, dv = F * vd;
      std::vector<float> o(size_t(F) * D);  // [F][L*vd] == [F][D]
      std::vector<float> probs(W);
      const float scale = 1.0f / std::sqrt(float(dk));
      float* kr = k_ring_[b].data();
      float* vr = v_ring_[b].data();
      for (int l = 0; l < L; ++l) {
        float* kl = kr + size_t(l) * W * dk;
        float* vl = vr + size_t(l) * W * dv;
        std::memcpy(kl + size_t(attn_pos_) * dk, kh.data() + size_t(l) * dk,
                    dk * sizeof(float));
        std::memcpy(vl + size_t(attn_pos_) * dv, vh.data() + size_t(l) * dv,
                    dv * sizeof(float));
        const float* ql = qh.data() + size_t(l) * dk;
        float smax = -1e30f;
        for (int j = 0; j < W; ++j) {
          const float* kj = kl + size_t(j) * dk;
          float s = 0;
          for (int d2 = 0; d2 < dk; ++d2) s += ql[d2] * kj[d2];
          probs[j] = s * scale;
          smax = std::max(smax, probs[j]);
        }
        float denom = 0;
        for (int j = 0; j < W; ++j) {
          probs[j] = std::exp(probs[j] - smax);
          denom += probs[j];
        }
        const float inv = 1.0f / denom;
        // out_l[F*vd] = sum_j p_j V[j]; scatter into o[f][l*vd + d]
        std::vector<float> ol(dv, 0.f);
        for (int j = 0; j < W; ++j) {
          const float pj = probs[j] * inv;
          const float* vj = vl + size_t(j) * dv;
          for (int d2 = 0; d2 < dv; ++d2) ol[d2] += pj * vj[d2];
        }
        for (int f = 0; f < F; ++f)
          std::memcpy(o.data() + size_t(f) * D + l * vd,
                      ol.data() + size_t(f) * vd, vd * sizeof(float));
      }
      // out projection + PReLU + LayerNorm over the flattened F*D vector
      std::vector<float> o2(size_t(F) * D);
      mm(o.data(), w_.at(p + "attn_out_proj.kernel"),
         w_.at(p + "attn_out_proj.bias").data.data(), o2.data(), F, D, D);
      prelu(o2.data(), w_.at(p + "attn_out_act.alpha").data[0], F * D);
      layer_norm(o2.data(), w_.at(p + "attn_out_norm.scale").data.data(),
                 w_.at(p + "attn_out_norm.bias").data.data(), 1, F * D);
      for (int i = 0; i < F * D; ++i) h[i] += o2[i];
    }
  }
  if (cfg_.use_attn)
    attn_pos_ = (attn_pos_ + 1) % cfg_.local_atten_len;

  g_prof.lap(3);
  // ---- deconv (flipped 3x3), over [deconv_buf ++ h] ----
  const int S2 = cfg_.num_src * 2;
  const Tensor& wd = w_.at("deconv.kernel");  // [3][3][D][S2] (pre-flip)
  const Tensor& bd = w_.at("deconv.bias");
  std::vector<float> est(cfg_.num_src * 2 * F, 0.f);
  const float* dframes[3] = {deconv_buf_.data(), deconv_buf_.data() + F * D,
                             h.data()};
  for (int f = 0; f < F; ++f) {
    float acc[16];
    std::memcpy(acc, bd.data.data(), S2 * sizeof(float));
    for (int dt = 0; dt < 3; ++dt)
      for (int df = -1; df <= 1; ++df) {
        const int ff = f + df;
        if (ff < 0 || ff >= F) continue;
        const float* in = dframes[dt] + ff * D;
        // kernel applied flipped in both spatial dims
        const float* wk =
            wd.data.data() + ((2 - dt) * 3 + (1 - df)) * D * S2;
        for (int i = 0; i < D; ++i) {
          const float xv = in[i];
          if (xv == 0.0f) continue;
          const float* wrow = wk + i * S2;
          for (int o = 0; o < S2; ++o) acc[o] += xv * wrow[o];
        }
      }
    for (int srci = 0; srci < cfg_.num_src; ++srci) {
      est[srci * 2 * F + f] = acc[srci * 2];
      est[srci * 2 * F + F + f] = acc[srci * 2 + 1];
    }
  }
  std::memcpy(deconv_buf_.data(), deconv_buf_.data() + F * D,
              F * D * sizeof(float));
  std::memcpy(deconv_buf_.data() + F * D, h.data(), F * D * sizeof(float));

  g_prof.lap(4);
  // ---- iSTFT overlap-add with 1-frame state ----
  const int chunk = cfg_.stft_chunk_size;
  const int pad = K - chunk;
  std::vector<float> synth0(K), synth1(K);
  for (int srci = 0; srci < cfg_.num_src; ++srci) {
    const float* prev = istft_buf_.data() + srci * 2 * F;
    const float* cur = est.data() + srci * 2 * F;
    for (int k = 0; k < K; ++k) {
      float a0 = 0, a1 = 0;
      for (int f2 = 0; f2 < 2 * F; ++f2) {
        const float flt = filters_[f2 * K + k];
        a0 += prev[f2] * flt;
        a1 += cur[f2] * flt;
      }
      synth0[k] = a0;
      synth1[k] = a1;
    }
    // reference causal_decoder semantics when stft_back_pad>0
    // (`tfgridnet_causal.py:423-431`): drop the first back samples of the
    // synthesized frame, add the previous frame's last (back+pad) samples
    // onto the head; identical to plain overlap-add when back==0.
    const int back = cfg_.stft_back_pad;
    float* o = out + srci * chunk;
    for (int j = 0; j < chunk; ++j)
      o[j] = synth1[back + j] + (j < pad ? synth0[chunk + j] : 0.0f);
  }
  std::memcpy(istft_buf_.data(), est.data(),
              cfg_.num_src * 2 * F * sizeof(float));
  g_prof.lap(5);
  g_prof.tick();
}

}  // namespace sbtpu

// ---------------------------------------------------------------- C API ----
extern "C" {
void* sbtpu_create(const char* model_dir) {
  try {
    return new sbtpu::Engine(model_dir);
  } catch (const std::exception& e) {
    std::cerr << "sbtpu_create: " << e.what() << std::endl;
    return nullptr;
  }
}
void sbtpu_destroy(void* h) { delete static_cast<sbtpu::Engine*>(h); }
void sbtpu_set_dis_embed(void* h, const float* oh, int len) {
  static_cast<sbtpu::Engine*>(h)->set_dis_embed(oh, len);
}
void sbtpu_reset(void* h) { static_cast<sbtpu::Engine*>(h)->reset(); }
void sbtpu_step(void* h, const float* mix, float* out) {
  static_cast<sbtpu::Engine*>(h)->step(mix, out);
}
int sbtpu_chunk_size(void* h) {
  return static_cast<sbtpu::Engine*>(h)->config().stft_chunk_size;
}
int sbtpu_pad_size(void* h) {
  return static_cast<sbtpu::Engine*>(h)->config().stft_pad_size;
}
int sbtpu_back_pad(void* h) {
  return static_cast<sbtpu::Engine*>(h)->config().stft_back_pad;
}
int sbtpu_num_ch(void* h) {
  return static_cast<sbtpu::Engine*>(h)->config().num_ch;
}
int sbtpu_num_src(void* h) {
  return static_cast<sbtpu::Engine*>(h)->config().num_src;
}
}

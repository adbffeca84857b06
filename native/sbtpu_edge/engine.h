// sbtpu_edge: standalone C++ streaming inference engine for the Sound Bubble
// causal TF-GridNet separator.
//
// The reference ships an ArmNN C++ smoke harness for on-device inference
// (/root/reference/edge/armnn_test); this engine is the full-capability
// native equivalent: it loads the weights blob + model_config.json produced
// by edge/export_model.py and runs the 8 ms-chunk streaming loop with
// internal state feedback, bit-matching the JAX model (verified against the
// exported .npy replication fixtures by edge/check_runtime.py and
// tests/test_native.py).
//
// Supported configs: merge_method=early_cat|None, conditional on/off,
// conv_lstm on/off, use_first_ln, spectral_masking, and use_attn (local
// causal attention with a W-frame K/V ring per block, matching the JAX
// model's K_buf/V_buf streaming semantics).
#pragma once

#include <cstdint>
#include <map>
#include <string>
#include <vector>

namespace sbtpu {

struct Tensor {
  std::vector<int> shape;
  std::vector<float> data;
  // int8 fast path (SBTW0002 blobs on VNNI-capable hosts): 2-D mats keep the
  // quantized payload packed for vpdpbusd (K-groups of 4 interleaved per
  // output column) instead of dequantizing; `data` stays empty then.
  bool quant = false;
  std::vector<int8_t> qpack;    // [(M+3)/4][N][4] byte layout
  std::vector<float> scales;    // per-output-column (minor dim)
  std::vector<int32_t> colsum;  // per-column sum of q (u8 zero-point fixup)
  int64_t size() const {
    int64_t n = 1;
    for (int d : shape) n *= d;
    return n;
  }
};

struct Config {
  int stft_chunk_size = 192;
  int stft_pad_size = 96;
  int stft_back_pad = 0;
  int num_ch = 6;
  int D = 32, B = 6, H = 64, L = 4, E = 2;
  int local_atten_len = 100;
  bool use_attn = false;
  bool conv_lstm = false;
  int lstm_down = 4;
  bool use_first_ln = true;
  std::string merge_method = "early_cat";
  bool directional = false;
  std::string dis_type = "conv3";
  int num_src = 1;
  bool conditional = true;

  int n_fft() const { return stft_back_pad + stft_chunk_size + stft_pad_size; }
  int n_freqs() const { return n_fft() / 2 + 1; }
  int n_feat() const {
    int n = 3 * (num_ch - 1);
    return directional ? n - 1 : n;
  }
  int conv_in() const {
    return merge_method == "early_cat" ? 2 * num_ch + n_feat() : 2 * num_ch;
  }
  int embed_width() const;
};

class Engine {
 public:
  // model_dir holds weights.bin + model_config.json
  explicit Engine(const std::string& model_dir);

  // true when the loaded blob carries int8 weights (SBTW0002): outputs then
  // drift from the f32 reference by quantization error, not by bugs.
  bool quantized() const { return quantized_; }

  // Set the bubble radius one-hot (len-3) conditioning; precomputes the
  // FiLM scales. Call before streaming (default 1 m = {0,0,1}).
  void set_dis_embed(const float* one_hot, int len);

  // Reset streaming state to zeros.
  void reset();

  // One streaming step: mix = [num_ch][chunk+pad] row-major window,
  // out = [num_src][chunk]. Uses and updates the internal state.
  void step(const float* mix, float* out);

  const Config& config() const { return cfg_; }

 private:
  void build_filterbank();
  void precompute_film();

  Config cfg_;
  bool quantized_ = false;
  std::map<std::string, Tensor> w_;

  // filterbank: [2F][K] analysis/synthesis matrix
  std::vector<float> filters_;

  // conditioning
  std::vector<float> dis_embed_;          // [F][d_in]
  std::vector<float> film_w_, film_b_;    // [B-1][F][D]

  // streaming state
  std::vector<float> conv_buf_;    // [2][F][conv_in]
  std::vector<float> deconv_buf_;  // [2][F][D]
  std::vector<float> istft_buf_;   // [num_src][1][2F]
  std::vector<std::vector<float>> h_, c_;  // per block: [F][H]
  // local attention K/V rings, per block: [L][W][F*E] / [L][W][F*(D/L)].
  // Slot `attn_pos_` holds the CURRENT frame once written; the other W-1
  // slots are the JAX model's K_buf/V_buf history (zeros at reset, exactly
  // like init_state). Attention is a softmax-weighted sum over all W slots,
  // which is permutation-invariant, so ring order == concat order.
  std::vector<std::vector<float>> k_ring_, v_ring_;
  int attn_pos_ = 0;

  // scratch
  std::vector<float> scratch_a_, scratch_b_, scratch_c_, scratch_d_;
};

}  // namespace sbtpu

// ---------------------------------------------------------------- C API ----
extern "C" {
void* sbtpu_create(const char* model_dir);
void sbtpu_destroy(void* handle);
void sbtpu_set_dis_embed(void* handle, const float* one_hot, int len);
void sbtpu_reset(void* handle);
void sbtpu_step(void* handle, const float* mix, float* out);
int sbtpu_chunk_size(void* handle);
int sbtpu_pad_size(void* handle);
int sbtpu_num_ch(void* handle);
int sbtpu_num_src(void* handle);
}

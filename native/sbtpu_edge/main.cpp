// sbtpu_run: native streaming conformance + latency harness.
//
// Usage: sbtpu_run <model_dir> <streaming_test_dir> [n_timing_runs]
//
// Loads the e2e streaming fixtures written by edge/export_model.py
// (e2e_input_X.npy, e2e_output_streaming.npy), runs the 8 ms-chunk loop with
// state feedback through the native engine, verifies the output against the
// JAX reference (atol 1e-3 like the reference's tests), and reports
// ms-per-chunk (the reference's check_runtime.py measurement, natively).
#include <chrono>
#include <cmath>
#include <cstring>
#include <fstream>
#include <iostream>
#include <vector>

#include "engine.h"

namespace {

// Minimal .npy reader (v1/v2, little-endian float32/float64, C order).
std::vector<float> load_npy(const std::string& path, std::vector<int>* shape) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0)
    throw std::runtime_error("not npy: " + path);
  uint8_t major, minor;
  f.read(reinterpret_cast<char*>(&major), 1);
  f.read(reinterpret_cast<char*>(&minor), 1);
  uint32_t header_len = 0;
  if (major == 1) {
    uint16_t hl;
    f.read(reinterpret_cast<char*>(&hl), 2);
    header_len = hl;
  } else {
    f.read(reinterpret_cast<char*>(&header_len), 4);
  }
  std::string header(header_len, '\0');
  f.read(header.data(), header_len);
  const bool f64 = header.find("<f8") != std::string::npos;
  if (!f64 && header.find("<f4") == std::string::npos)
    throw std::runtime_error("unsupported dtype in " + path);
  auto p = header.find("'shape':");
  p = header.find('(', p) + 1;
  auto e = header.find(')', p);
  std::string dims = header.substr(p, e - p);
  shape->clear();
  size_t pos = 0;
  while (pos < dims.size()) {
    size_t next = dims.find(',', pos);
    std::string tok = dims.substr(pos, next == std::string::npos
                                           ? std::string::npos
                                           : next - pos);
    if (tok.find_first_of("0123456789") != std::string::npos)
      shape->push_back(std::stoi(tok));
    if (next == std::string::npos) break;
    pos = next + 1;
  }
  int64_t n = 1;
  for (int d : *shape) n *= d;
  std::vector<float> out(n);
  if (f64) {
    std::vector<double> tmp(n);
    f.read(reinterpret_cast<char*>(tmp.data()), n * 8);
    for (int64_t i = 0; i < n; ++i) out[i] = static_cast<float>(tmp[i]);
  } else {
    f.read(reinterpret_cast<char*>(out.data()), n * 4);
  }
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: sbtpu_run <model_dir> <streaming_test_dir> [runs]\n";
    return 2;
  }
  const std::string model_dir = argv[1];
  const std::string test_dir = argv[2];
  const int timing_runs = argc > 3 ? std::atoi(argv[3]) : 50;

  sbtpu::Engine engine(model_dir);
  const auto& cfg = engine.config();
  const int chunk = cfg.stft_chunk_size;
  const int pad = cfg.stft_pad_size + cfg.stft_back_pad;
  const int M = cfg.num_ch;

  std::vector<int> xs, ys;
  auto X = load_npy(test_dir + "/e2e_input_X.npy", &xs);           // [1,M,N]
  auto Y = load_npy(test_dir + "/e2e_output_streaming.npy", &ys);  // [1,S,T]
  const int n_samples = xs[2];
  const int n_chunks = (n_samples - pad) / chunk;

  // rolling-window streaming loop (reference causal_infer semantics)
  std::vector<float> window(M * (chunk + pad), 0.f);
  std::vector<float> out(cfg.num_src * chunk);
  std::vector<float> est(cfg.num_src * n_chunks * chunk, 0.f);
  auto roll_in = [&](int start) {
    for (int m = 0; m < M; ++m) {
      float* w = window.data() + m * (chunk + pad);
      std::memmove(w, w + chunk, pad * sizeof(float));
      std::memcpy(w + pad, X.data() + m * n_samples + start,
                  chunk * sizeof(float));
    }
  };
  // preload lookahead
  for (int m = 0; m < M; ++m)
    std::memcpy(window.data() + m * (chunk + pad) + chunk,
                X.data() + m * n_samples, pad * sizeof(float));

  for (int t = 0; t < n_chunks; ++t) {
    roll_in(pad + t * chunk);
    engine.step(window.data(), out.data());
    for (int s = 0; s < cfg.num_src; ++s)
      std::memcpy(est.data() + (s * n_chunks + t) * chunk,
                  out.data() + s * chunk, chunk * sizeof(float));
  }

  float max_err = 0;
  for (size_t i = 0; i < est.size(); ++i)
    max_err = std::max(max_err, std::abs(est[i] - Y[i]));
  std::cout << "max |err| vs JAX streaming output: " << max_err << "\n";
  // quantized blobs drift from the f32 reference by design (the same ~1e-2
  // envelope as torch's dynamic-quantized LSTM); correctness for them is
  // bounded by tests/test_native.py's drift/correlation checks
  const float tol = engine.quantized() ? 5e-2f : 1e-3f;
  if (engine.quantized())
    std::cout << "(int8 blob: conformance tolerance " << tol << ")\n";

  // timing: repeated single-chunk steps (state feedback, like deployment)
  engine.reset();
  auto t0 = std::chrono::steady_clock::now();
  for (int r = 0; r < timing_runs; ++r) engine.step(window.data(), out.data());
  auto t1 = std::chrono::steady_clock::now();
  const double ms =
      std::chrono::duration<double, std::milli>(t1 - t0).count() / timing_runs;
  std::cout << "native per-chunk: " << ms << " ms (" << chunk / 24.0
            << " ms audio, RTF " << (chunk / 24.0) / ms << "x)\n";

  if (max_err > tol) {
    std::cout << "CONFORMANCE: FAIL\n";
    return 1;
  }
  std::cout << "CONFORMANCE: PASS\n";
  return 0;
}

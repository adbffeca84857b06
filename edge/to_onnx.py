"""Reference-named export entry point.

The reference's `edge/to_onnx.py` traces the streaming model with
`torch.onnx.export` (reference edge/to_onnx.py:116-136). Here the same
`models/ONNX/model.onnx` artifact (identical `mixture`/`out::` I/O naming)
is produced by lowering the model's own jaxpr (runtime/onnx_export.py, no
ONNX toolchain needed) alongside the TPU-native formats: StableHLO, TFLite,
and the native-engine weights blob — see `edge/export_model.py`, which this
script forwards to (same fixtures/conformance outputs as the reference).
"""
import sys

from edge.export_model import main  # noqa: F401

if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--out_dir", default="models")
    p.add_argument("--runs", type=int, default=100)
    p.add_argument("--skip_tflite", action="store_true")
    sys.exit(main(p.parse_args()))

"""From-scratch numpy evaluator for the exported ONNX graphs.

There is no `onnx`/`onnxruntime` in this image, so conformance of the
runtime/onnx_export.py artifact is closed here: parse the serialized
ModelProto back through runtime/onnx_wire.py and execute it with numpy,
then compare against the JAX streaming step (tests/test_onnx_export.py).
Implements exactly the op subset the exporter emits (ONNX opset 17
semantics, including `Scan` subgraphs with outer-scope capture). This is an
executable spec of the artifact, not a production runtime — the deployment
paths are the native engine and TFLite (runtime/export.py).

Reference anchor: the reference validates its export by running
onnxruntime right inside `to_onnx.py` (/root/reference/edge/to_onnx.py:163-190);
this module plays that role in-image.
"""
from __future__ import annotations

import numpy as np

from sound_bubble_tpu.runtime import onnx_wire as ow

_INT64_MIN = -(2 ** 63)


class _Env:
    """Name -> value scope chain (ONNX subgraphs see enclosing scopes)."""

    def __init__(self, parent=None):
        self.vals: dict[str, np.ndarray] = {}
        self.parent = parent

    def __getitem__(self, name):
        env = self
        while env is not None:
            if name in env.vals:
                return env.vals[name]
            env = env.parent
        raise KeyError(f"ONNX value '{name}' not bound")

    def __setitem__(self, name, v):
        self.vals[name] = v


def _slice(data, starts, ends, axes, steps):
    sl = [slice(None)] * data.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        a = int(a)
        dim = data.shape[a]
        s, e, st = int(s), int(e), int(st)
        if st < 0:
            stop = None if e < -dim else e
            sl[a] = slice(s, stop, st)
        else:
            sl[a] = slice(s, min(e, dim) if e >= 0 else e, st)
    return data[tuple(sl)]


def _conv(x, w, strides, pads, dilations, group):
    n, c, h, wi = x.shape
    m, cg, kh, kw = w.shape
    sh, sw = strides
    dh, dw = dilations
    x = np.pad(x, ((0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])))
    hp, wp = x.shape[2], x.shape[3]
    ho = (hp - ((kh - 1) * dh + 1)) // sh + 1
    wo = (wp - ((kw - 1) * dw + 1)) // sw + 1
    mg = m // group
    out = np.zeros((n, m, ho, wo), np.result_type(x, w))
    for g in range(group):
        xs = x[:, g * cg:(g + 1) * cg]
        ws = w[g * mg:(g + 1) * mg]
        for i in range(kh):
            for j in range(kw):
                patch = xs[:, :, i * dh:i * dh + ho * sh:sh,
                           j * dw:j * dw + wo * sw:sw]
                out[:, g * mg:(g + 1) * mg] += np.einsum(
                    "nchw,mc->nmhw", patch, ws[:, :, i, j])
    return out


def _run_scan(node, env, run_graph):
    body = node.attrs["body"]
    n_scan = int(node.attrs["num_scan_inputs"])
    n_state = len(node.inputs) - n_scan
    in_dirs = node.attrs.get("scan_input_directions") or [0] * n_scan
    n_ys = len(node.outputs) - n_state
    out_dirs = node.attrs.get("scan_output_directions") or [0] * n_ys
    states = [env[x] for x in node.inputs[:n_state]]
    xs = [env[x] for x in node.inputs[n_state:]]
    t_len = xs[0].shape[0]
    ys = [[None] * t_len for _ in range(n_ys)]
    for t in range(t_len):
        child = _Env(env)
        for vi, st in zip(body.inputs[:n_state], states):
            child[vi.name] = st
        for k, (vi, x) in enumerate(zip(body.inputs[n_state:], xs)):
            idx = t_len - 1 - t if in_dirs[k] else t
            child[vi.name] = x[idx]
        outs = run_graph(body, child)
        states = outs[:n_state]
        for k in range(n_ys):
            idx = t_len - 1 - t if out_dirs[k] else t
            ys[k][idx] = outs[n_state + k]
    stacked = [np.stack(y) if t_len else
               np.zeros((0,) + tuple(), np.float32) for y in ys]
    return states + stacked


def _erf(x):
    from scipy.special import erf
    return erf(x)


_EW = {
    "Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
    "Div": lambda a, b: np.divide(a, b) if a.dtype.kind == "f"
    else a // b,
    "Max": np.maximum, "Min": np.minimum, "Tanh": np.tanh,
    "Sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
    "Exp": np.exp, "Log": np.log, "Sqrt": np.sqrt, "Abs": np.abs,
    "Neg": np.negative, "Sign": np.sign, "Floor": np.floor,
    "Ceil": np.ceil, "Pow": np.power, "Reciprocal": np.reciprocal,
    "And": np.logical_and, "Or": np.logical_or, "Not": np.logical_not,
    "Equal": np.equal, "Greater": np.greater, "Less": np.less,
    "GreaterOrEqual": np.greater_equal, "LessOrEqual": np.less_equal,
    "Atan": np.arctan, "Sin": np.sin, "Cos": np.cos, "Erf": _erf,
    "Identity": lambda x: x,
}


def _run_node(node, env, run_graph):
    op = node.op_type
    if op in _EW:
        vals = [env[x] for x in node.inputs]
        out = _EW[op](*vals)
        # comparison/logical results must be bool tensors, not python bools
        env[node.outputs[0]] = np.asarray(out)
        return
    i = [env[x] for x in node.inputs]
    a = node.attrs
    if op == "Where":
        out = np.where(i[0], i[1], i[2])
    elif op == "Cast":
        out = i[0].astype(ow._ONNX2NP[int(a["to"])])
    elif op == "Transpose":
        out = np.transpose(i[0], a["perm"])
    elif op == "Reshape":
        out = i[0].reshape([int(d) for d in i[1]])
    elif op == "Squeeze":
        out = np.squeeze(i[0], tuple(int(d) for d in i[1]))
    elif op == "Unsqueeze":
        out = i[0]
        for d in sorted(int(x) for x in i[1]):
            out = np.expand_dims(out, d)
    elif op == "Expand":
        shape = np.broadcast_shapes(i[0].shape, tuple(int(d) for d in i[1]))
        out = np.broadcast_to(i[0], shape)
    elif op == "Concat":
        out = np.concatenate(i, axis=int(a["axis"]))
    elif op == "Slice":
        axes = i[3] if len(i) > 3 else np.arange(i[0].ndim)
        steps = i[4] if len(i) > 4 else np.ones(len(i[1]), np.int64)
        out = _slice(i[0], i[1], i[2], axes, steps)
    elif op == "Pad":
        pads = [int(p) for p in i[1]]
        rank = i[0].ndim
        cval = float(np.asarray(i[2]).reshape(-1)[0]) if len(i) > 2 else 0.0
        out = np.pad(i[0], list(zip(pads[:rank], pads[rank:])),
                     constant_values=cval)
    elif op == "MatMul":
        out = np.matmul(i[0], i[1])
    elif op == "Conv":
        out = _conv(i[0], i[1],
                    a.get("strides", [1, 1]), a.get("pads", [0, 0, 0, 0]),
                    a.get("dilations", [1, 1]), int(a.get("group", 1)))
        if len(i) > 2:
            out = out + i[2].reshape(1, -1, 1, 1)
    elif op == "ReduceSum":
        axes = tuple(int(d) for d in i[1]) if len(i) > 1 else None
        out = np.sum(i[0], axis=axes, keepdims=bool(a.get("keepdims", 1)))
    elif op in ("ReduceMax", "ReduceMin"):
        f = np.max if op == "ReduceMax" else np.min
        axes = tuple(a["axes"]) if "axes" in a else None
        out = f(i[0], axis=axes, keepdims=bool(a.get("keepdims", 1)))
    elif op == "Mod":
        out = np.fmod(i[0], i[1]) if a.get("fmod") else np.mod(i[0], i[1])
    elif op == "Scan":
        outs = _run_scan(node, env, run_graph)
        for name, v in zip(node.outputs, outs):
            env[name] = v
        return
    else:
        raise NotImplementedError(f"ONNX op '{op}' not implemented")
    env[node.outputs[0]] = np.asarray(out)


def _run_graph(graph, env):
    for t in graph.initializers:
        if t.name not in env.vals:
            env[t.name] = t.array
    for node in graph.nodes:
        _run_node(node, env, _run_graph)
    return [env[o.name] for o in graph.outputs]


class OnnxEvaluator:
    """Execute a serialized ONNX model: `OnnxEvaluator(path).run(feeds)`."""

    def __init__(self, path_or_model):
        if isinstance(path_or_model, (str, bytes)):
            self.model = (ow.load(path_or_model)
                          if isinstance(path_or_model, str)
                          else ow.Model.decode(path_or_model))
        else:
            self.model = path_or_model
        self.graph = self.model.graph
        self.input_names = [vi.name for vi in self.graph.inputs]
        self.output_names = [vi.name for vi in self.graph.outputs]

    def run(self, feeds: dict) -> dict:
        env = _Env()
        for k, v in feeds.items():
            env[k] = np.asarray(v)
        outs = _run_graph(self.graph, env)
        return dict(zip(self.output_names, outs))

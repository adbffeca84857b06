"""Generic jaxpr -> ONNX lowering + the streaming-step ONNX exporter.

The reference ships its edge model as `model.onnx` traced by
`torch.onnx.export` (/root/reference/edge/to_onnx.py:116-136, opset 13-ish,
inputs `['mixture'] + buffer_names`, outputs `['filtered_output'] +
['out::'+n]`). The TPU rebuild's model is JAX, so instead of a torch tracer
this module lowers the model's OWN jaxpr: `jax.make_jaxpr` on the flat
streaming step (runtime/export.py `make_flat_step`), then a primitive-by-
primitive translation to an ONNX graph (opset 17):

- `lax.scan` (the LSTM recurrences) -> ONNX `Scan` with a body subgraph;
  consts are resolved through ONNX's lexical outer-scope capture, reverse
  scans via `scan_input/output_directions` — no unrolling, no ONNX-LSTM
  gate-order gymnastics;
- `dot_general` -> canonical Transpose/Reshape + (stacked) MatMul;
- `conv_general_dilated` -> layout-transposed ONNX Conv (any NHWC/HWIO-style
  dimension_numbers);
- everything else is a 1:1 or short composite mapping (see `_HANDLERS`).

Weights ride along as initializers (the jaxpr's consts), so the artifact is
self-contained. Conformance is closed in-image by the from-scratch numpy
evaluator (runtime/onnx_eval.py) against the JAX step; on a machine with
onnxruntime the same file loads directly.
"""
from __future__ import annotations

import itertools

import jax
import numpy as np

from sound_bubble_tpu.runtime import onnx_wire as ow
from sound_bubble_tpu.runtime.onnx_wire import (
    Attribute, Graph, Model, Node, Tensor, ValueInfo,
)

_INT64_MIN = -(2 ** 63)


class _Ctx:
    """Shared lowering state: fresh-name counter + top-level initializers
    (subgraphs see them through ONNX outer-scope capture)."""

    def __init__(self):
        self._counter = itertools.count()
        self.initializers: list[Tensor] = []

    def fresh(self, hint: str = "v") -> str:
        return f"{hint}_{next(self._counter)}"

    def const(self, arr, hint: str = "c") -> str:
        arr = np.asarray(arr)
        if arr.dtype == np.int32:
            arr = arr.astype(np.int64)
        name = self.fresh(hint)
        self.initializers.append(Tensor(name, arr))
        return name

    def i64(self, vals) -> str:
        return self.const(np.asarray(vals, np.int64), "idx")


def _aval_np(var):
    return np.dtype(var.aval.dtype)


def _name_of(ctx, env, atom):
    """jax atom (Var or Literal) -> ONNX value name."""
    if hasattr(atom, "val"):                       # Literal
        v = np.asarray(atom.val, _aval_np(atom))
        return ctx.const(v, "lit")
    return env[atom]


def _node(nodes, op, inputs, outputs, **attrs):
    nodes.append(Node(op, list(inputs), list(outputs), dict(attrs)))


# --------------------------- primitive handlers ---------------------------
# each: handler(ctx, eqn, in_names, out_names, nodes) -> None

def _ew(op):
    def h(ctx, eqn, ins, outs, nodes):
        _node(nodes, op, ins, outs)
    return h


def _cast_to(ctx, nodes, name, onnx_dtype):
    out = ctx.fresh("cast")
    _node(nodes, "Cast", [name], [out], to=onnx_dtype)
    return out


def _h_convert(ctx, eqn, ins, outs, nodes):
    dt = ow._NP2ONNX[np.dtype(eqn.params["new_dtype"])]
    _node(nodes, "Cast", ins, outs, to=dt)


def _h_rsqrt(ctx, eqn, ins, outs, nodes):
    s = ctx.fresh("sqrt")
    _node(nodes, "Sqrt", ins, [s])
    _node(nodes, "Reciprocal", [s], outs)


def _h_square(ctx, eqn, ins, outs, nodes):
    _node(nodes, "Mul", [ins[0], ins[0]], outs)


def _h_integer_pow(ctx, eqn, ins, outs, nodes):
    y = float(eqn.params["y"])
    e = ctx.const(np.asarray(y, _aval_np(eqn.invars[0])), "exp")
    _node(nodes, "Pow", [ins[0], e], outs)


def _h_select_n(ctx, eqn, ins, outs, nodes):
    if len(ins) != 3:
        raise NotImplementedError("select_n with >2 cases")
    # select_n(pred, on_false, on_true); Where(cond, X, Y): X where cond
    _node(nodes, "Where", [ins[0], ins[2], ins[1]], outs)


def _h_ne(ctx, eqn, ins, outs, nodes):
    e = ctx.fresh("eq")
    _node(nodes, "Equal", ins, [e])
    _node(nodes, "Not", [e], outs)


def _h_transpose(ctx, eqn, ins, outs, nodes):
    _node(nodes, "Transpose", ins, outs,
          perm=[int(p) for p in eqn.params["permutation"]])


def _h_reshape(ctx, eqn, ins, outs, nodes):
    if eqn.params.get("dimensions") is not None:
        perm = [int(p) for p in eqn.params["dimensions"]]
        t = ctx.fresh("tr")
        _node(nodes, "Transpose", ins, [t], perm=perm)
        src = t
    else:
        src = ins[0]
    shape = ctx.i64(eqn.params["new_sizes"])
    _node(nodes, "Reshape", [src, shape], outs)


def _h_squeeze(ctx, eqn, ins, outs, nodes):
    axes = ctx.i64(eqn.params["dimensions"])
    _node(nodes, "Squeeze", [ins[0], axes], outs)


def _h_expand_dims(ctx, eqn, ins, outs, nodes):
    axes = ctx.i64(eqn.params["dimensions"])
    _node(nodes, "Unsqueeze", [ins[0], axes], outs)


def _h_broadcast(ctx, eqn, ins, outs, nodes):
    shape = eqn.params["shape"]
    bdims = eqn.params["broadcast_dimensions"]
    in_shape = eqn.invars[0].aval.shape
    interm = [1] * len(shape)
    for i, d in enumerate(bdims):
        interm[d] = in_shape[i]
    r = ctx.fresh("bc_r")
    _node(nodes, "Reshape", [ins[0], ctx.i64(interm)], [r])
    _node(nodes, "Expand", [r, ctx.i64(shape)], outs)


def _h_concat(ctx, eqn, ins, outs, nodes):
    _node(nodes, "Concat", ins, outs, axis=int(eqn.params["dimension"]))


def _h_slice(ctx, eqn, ins, outs, nodes):
    starts = eqn.params["start_indices"]
    ends = eqn.params["limit_indices"]
    strides = eqn.params.get("strides") or [1] * len(starts)
    axes = list(range(len(starts)))
    _node(nodes, "Slice",
          [ins[0], ctx.i64(starts), ctx.i64(ends), ctx.i64(axes),
           ctx.i64(strides)], outs)


def _h_rev(ctx, eqn, ins, outs, nodes):
    dims = list(eqn.params["dimensions"])
    k = len(dims)
    _node(nodes, "Slice",
          [ins[0], ctx.i64([-1] * k), ctx.i64([_INT64_MIN] * k),
           ctx.i64(dims), ctx.i64([-1] * k)], outs)


def _h_pad(ctx, eqn, ins, outs, nodes):
    cfg = eqn.params["padding_config"]
    if any(interior != 0 for _, _, interior in cfg):
        raise NotImplementedError("interior (dilating) pad")
    rank = len(cfg)
    pos_lo = [max(lo, 0) for lo, _, _ in cfg]
    pos_hi = [max(hi, 0) for _, hi, _ in cfg]
    neg_lo = [max(-lo, 0) for lo, _, _ in cfg]
    neg_hi = [max(-hi, 0) for _, hi, _ in cfg]
    src = ins[0]
    if any(pos_lo) or any(pos_hi):
        padded = ctx.fresh("pad")
        _node(nodes, "Pad",
              [src, ctx.i64(pos_lo + pos_hi), ins[1]], [padded],
              mode="constant")
        src = padded
    if any(neg_lo) or any(neg_hi):
        in_shape = eqn.invars[0].aval.shape
        dims = [s + max(lo, 0) + max(hi, 0)
                for s, (lo, hi, _) in zip(in_shape, cfg)]
        ends = [d - h for d, h in zip(dims, neg_hi)]
        sl = ctx.fresh("crop")
        _node(nodes, "Slice",
              [src, ctx.i64(neg_lo), ctx.i64(ends),
               ctx.i64(list(range(rank))), ctx.i64([1] * rank)], [sl])
        src = sl
    _node(nodes, "Identity", [src], outs)


def _h_dot_general(ctx, eqn, ins, outs, nodes):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    l_free = [i for i in range(len(lhs.shape)) if i not in lc and i not in lb]
    r_free = [i for i in range(len(rhs.shape)) if i not in rc and i not in rb]

    def prep(name, aval, batch, free, contract, contract_first):
        order = list(batch) + (
            list(contract) + list(free) if contract_first
            else list(free) + list(contract))
        t = name
        if order != list(range(len(aval.shape))):
            t = ctx.fresh("dg_t")
            _node(nodes, "Transpose", [name], [t], perm=order)
        b = int(np.prod([aval.shape[i] for i in batch], dtype=np.int64)) \
            if batch else None
        f = int(np.prod([aval.shape[i] for i in free], dtype=np.int64))
        c = int(np.prod([aval.shape[i] for i in contract], dtype=np.int64))
        tgt = ([b, c, f] if contract_first else [b, f, c]) if batch \
            else ([c, f] if contract_first else [f, c])
        r = ctx.fresh("dg_r")
        _node(nodes, "Reshape", [t, ctx.i64(tgt)], [r])
        return r

    l2 = prep(ins[0], lhs, lb, l_free, lc, contract_first=False)
    r2 = prep(ins[1], rhs, rb, r_free, rc, contract_first=True)
    mm = ctx.fresh("mm")
    _node(nodes, "MatMul", [l2, r2], [mm])
    out_shape = ([lhs.shape[i] for i in lb]
                 + [lhs.shape[i] for i in l_free]
                 + [rhs.shape[i] for i in r_free])
    _node(nodes, "Reshape", [mm, ctx.i64(out_shape)], outs)


def _h_conv(ctx, eqn, ins, outs, nodes):
    p = eqn.params
    dn = p["dimension_numbers"]
    if p.get("batch_group_count", 1) != 1:
        raise NotImplementedError("batch_group_count > 1")
    if any(d != 1 for d in p.get("lhs_dilation", (1, 1))):
        raise NotImplementedError("lhs_dilation (transposed conv)")
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    # lhs_spec = (batch, feature, *spatial) as INDEX positions
    x = ctx.fresh("cv_x")
    _node(nodes, "Transpose", [ins[0]], [x], perm=list(lhs_spec))
    w = ctx.fresh("cv_w")
    _node(nodes, "Transpose", [ins[1]], [w], perm=list(rhs_spec))
    pads = [lo for lo, _ in p["padding"]] + [hi for _, hi in p["padding"]]
    y = ctx.fresh("cv_y")
    _node(nodes, "Conv", [x, w], [y],
          strides=[int(s) for s in p["window_strides"]],
          pads=[int(q) for q in pads],
          dilations=[int(d) for d in p.get("rhs_dilation", (1, 1))],
          group=int(p.get("feature_group_count", 1)))
    inv = [0] * len(out_spec)
    for i, d in enumerate(out_spec):
        inv[d] = i
    _node(nodes, "Transpose", [y], outs, perm=inv)


def _h_iota(ctx, eqn, ins, outs, nodes):
    p = eqn.params
    shape, dim = p["shape"], p["dimension"]
    arr = np.arange(shape[dim], dtype=np.dtype(p["dtype"]))
    arr = np.broadcast_to(
        arr.reshape([-1 if i == dim else 1 for i in range(len(shape))]),
        shape).copy()
    _node(nodes, "Identity", [ctx.const(arr, "iota")], outs)


def _h_dynamic_slice(ctx, eqn, ins, outs, nodes):
    sizes = eqn.params["slice_sizes"]
    rank = len(sizes)
    x_shape = eqn.invars[0].aval.shape
    parts = []
    for k in range(rank):
        i64 = _cast_to(ctx, nodes, ins[1 + k], ow.INT64)
        u = ctx.fresh("ds_u")
        _node(nodes, "Unsqueeze", [i64, ctx.i64([0])], [u])
        parts.append(u)
    starts_raw = ctx.fresh("ds_s")
    if rank == 1:
        _node(nodes, "Identity", [parts[0]], [starts_raw])
    else:
        _node(nodes, "Concat", parts, [starts_raw], axis=0)
    # jax clamps starts to [0, dim - size]; Min/Max broadcast elementwise
    hi = ctx.i64([x_shape[k] - sizes[k] for k in range(rank)])
    lo_cl = ctx.fresh("ds_lo")
    _node(nodes, "Max", [starts_raw, ctx.const(np.asarray(0, np.int64))],
          [lo_cl])
    starts = ctx.fresh("ds_cl")
    _node(nodes, "Min", [lo_cl, hi], [starts])
    ends = ctx.fresh("ds_e")
    _node(nodes, "Add", [starts, ctx.i64(list(sizes))], [ends])
    _node(nodes, "Slice",
          [ins[0], starts, ends, ctx.i64(list(range(rank))),
           ctx.i64([1] * rank)], outs)


def _h_scan(ctx, eqn, ins, outs, nodes, env_lower):
    p = eqn.params
    nc, ncar = p["num_consts"], p["num_carry"]
    closed = p["jaxpr"]
    body_jaxpr = closed.jaxpr
    n_xs = len(ins) - nc - ncar
    n_ys = len(outs) - ncar
    if n_xs == 0:
        raise NotImplementedError("scan with no scan inputs (use Loop)")
    reverse = bool(p.get("reverse", False))

    body_env = {}
    for cv, cname in zip(body_jaxpr.constvars, closed.consts):
        body_env[cv] = ctx.const(np.asarray(cname), "scan_c")
    # const invars resolve to OUTER names (lexical capture)
    for v, name in zip(body_jaxpr.invars[:nc], ins[:nc]):
        body_env[v] = name
    body_inputs = []
    for v in body_jaxpr.invars[nc:]:
        name = ctx.fresh("scan_in")
        body_env[v] = name
        body_inputs.append(ValueInfo(
            name, ow._NP2ONNX[_aval_np(v)], tuple(v.aval.shape)))
    body_nodes: list[Node] = []
    body_out_names = env_lower(body_jaxpr, body_env, body_nodes)
    # ONNX subgraph outputs must be distinct node-produced names
    body_outputs = []
    for v, name in zip(body_jaxpr.outvars, body_out_names):
        o = ctx.fresh("scan_out")
        _node(body_nodes, "Identity", [name], [o])
        body_outputs.append(ValueInfo(
            o, ow._NP2ONNX[_aval_np(v)], tuple(v.aval.shape)))
    body = Graph("scan_body", body_nodes, body_inputs, body_outputs)

    attrs = dict(body=body, num_scan_inputs=n_xs)
    if reverse:
        attrs["scan_input_directions"] = [1] * n_xs
        attrs["scan_output_directions"] = [1] * n_ys
    nodes.append(Node("Scan", list(ins[nc:]), list(outs), attrs))


def _h_reduce_sum(ctx, eqn, ins, outs, nodes):
    axes = ctx.i64(list(eqn.params["axes"]))
    _node(nodes, "ReduceSum", [ins[0], axes], outs, keepdims=0)


def _reduce_attr(op):
    def h(ctx, eqn, ins, outs, nodes):
        _node(nodes, op, ins, outs,
              axes=[int(a) for a in eqn.params["axes"]], keepdims=0)
    return h


def _h_identity(ctx, eqn, ins, outs, nodes):
    for i, o in zip(ins, outs):
        _node(nodes, "Identity", [i], [o])


_HANDLERS = {
    "add": _ew("Add"), "sub": _ew("Sub"), "mul": _ew("Mul"),
    "div": _ew("Div"), "max": _ew("Max"), "min": _ew("Min"),
    "tanh": _ew("Tanh"), "logistic": _ew("Sigmoid"), "exp": _ew("Exp"),
    "log": _ew("Log"), "sqrt": _ew("Sqrt"), "abs": _ew("Abs"),
    "neg": _ew("Neg"), "sign": _ew("Sign"), "floor": _ew("Floor"),
    "ceil": _ew("Ceil"), "pow": _ew("Pow"), "rem": _ew("Mod"),
    "and": _ew("And"), "or": _ew("Or"), "not": _ew("Not"),
    "eq": _ew("Equal"), "gt": _ew("Greater"), "lt": _ew("Less"),
    "ge": _ew("GreaterOrEqual"), "le": _ew("LessOrEqual"), "ne": _h_ne,
    "atan": _ew("Atan"), "sin": _ew("Sin"), "cos": _ew("Cos"),
    "erf": _ew("Erf"),
    "rsqrt": _h_rsqrt, "square": _h_square, "integer_pow": _h_integer_pow,
    "select_n": _h_select_n, "convert_element_type": _h_convert,
    "transpose": _h_transpose, "reshape": _h_reshape,
    "squeeze": _h_squeeze, "expand_dims": _h_expand_dims,
    "broadcast_in_dim": _h_broadcast, "concatenate": _h_concat,
    "slice": _h_slice, "rev": _h_rev, "pad": _h_pad,
    "dot_general": _h_dot_general, "conv_general_dilated": _h_conv,
    "iota": _h_iota, "dynamic_slice": _h_dynamic_slice,
    "reduce_sum": _h_reduce_sum,
    "reduce_max": _reduce_attr("ReduceMax"),
    "reduce_min": _reduce_attr("ReduceMin"),
    "stop_gradient": _h_identity, "copy": _h_identity,
    "optimization_barrier": _h_identity,
}

_INLINE = {"jit", "pjit", "closed_call", "core_call", "remat2", "remat",
           "checkpoint", "custom_jvp_call", "custom_vjp_call",
           "custom_jvp_call_jaxpr", "custom_vjp_call_jaxpr"}


def _inner_jaxpr(params):
    for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
        if k in params and params[k] is not None:
            return params[k]
    raise KeyError(f"no inner jaxpr among {list(params)}")


def _lower(ctx, jaxpr, env, nodes):
    """Lower an (open) jaxpr's eqns into `nodes`; returns output names."""
    for eqn in jaxpr.eqns:
        ins = [_name_of(ctx, env, a) for a in eqn.invars]
        prim = eqn.primitive.name
        if prim in _INLINE:
            inner = _inner_jaxpr(eqn.params)
            consts = []
            if hasattr(inner, "jaxpr"):            # ClosedJaxpr
                consts = inner.consts
                inner = inner.jaxpr
            sub_env = {}
            for cv, c in zip(inner.constvars, consts):
                sub_env[cv] = ctx.const(np.asarray(c), "cc")
            for v, name in zip(inner.invars, ins):
                sub_env[v] = name
            sub_out = _lower(ctx, inner, sub_env, nodes)
            for v, name in zip(eqn.outvars, sub_out):
                env[v] = name
            continue
        outs = [ctx.fresh(prim[:12]) for _ in eqn.outvars]
        if prim == "scan":
            def env_lower(jx, sub_env, sub_nodes):
                return _lower(ctx, jx, sub_env, sub_nodes)
            _h_scan(ctx, eqn, ins, outs, nodes, env_lower)
        else:
            h = _HANDLERS.get(prim)
            if h is None:
                raise NotImplementedError(
                    f"no ONNX lowering for primitive '{prim}' "
                    f"(params: {list(eqn.params)})")
            h(ctx, eqn, ins, outs, nodes)
        for v, name in zip(eqn.outvars, outs):
            env[v] = name
    out_names = []
    for v in jaxpr.outvars:
        out_names.append(_name_of(ctx, env, v))
    return out_names


def lower_closed_jaxpr(closed, input_names, graph_name="graph",
                       output_names=None):
    """ClosedJaxpr + input names -> ow.Graph (weights as initializers)."""
    ctx = _Ctx()
    jaxpr = closed.jaxpr
    env = {}
    for cv, c in zip(jaxpr.constvars, closed.consts):
        env[cv] = ctx.const(np.asarray(c), "w")
    inputs = []
    for v, name in zip(jaxpr.invars, input_names):
        env[v] = name
        inputs.append(ValueInfo(
            name, ow._NP2ONNX[_aval_np(v)], tuple(v.aval.shape)))
    nodes: list[Node] = []
    raw_outs = _lower(ctx, jaxpr, env, nodes)
    if output_names is None:
        output_names = [f"output_{i}" for i in range(len(raw_outs))]
    outputs = []
    for v, raw, name in zip(jaxpr.outvars, raw_outs, output_names):
        _node(nodes, "Identity", [raw], [name])
        outputs.append(ValueInfo(
            name, ow._NP2ONNX[_aval_np(v)], tuple(v.aval.shape)))
    g = Graph(graph_name, nodes, inputs, outputs)
    g.initializers = ctx.initializers
    return g


def export_onnx(net, params, path: str, dis_embed=None) -> str:
    """Write the streaming step as a self-contained model.onnx.

    Same I/O contract as the reference export
    (/root/reference/edge/to_onnx.py:125-136): inputs `mixture` +
    flattened state buffer names, outputs `filtered_output` + `out::<name>`.
    """
    import os

    import sound_bubble_tpu.ops.rnn as rnn
    from sound_bubble_tpu.runtime.export import make_flat_step

    fn, names, bufs0, mix = make_flat_step(net, params, dis_embed)
    saved = (rnn._PALLAS_BLSTM, rnn._CUSTOM_VJP, rnn._PALLAS_TRAIN)
    rnn._PALLAS_BLSTM = rnn._CUSTOM_VJP = rnn._PALLAS_TRAIN = False
    try:
        closed = jax.make_jaxpr(fn)(mix, *bufs0)
    finally:
        rnn._PALLAS_BLSTM, rnn._CUSTOM_VJP, rnn._PALLAS_TRAIN = saved
    graph = lower_closed_jaxpr(
        closed, ["mixture"] + list(names), "sound_bubble_streaming_step",
        ["filtered_output"] + [f"out::{n}" for n in names])
    model = Model(graph)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ow.save(model, path)
    return path

"""Join a train-step trace with the program's compiled HLO to attribute
device time PER CONV SHAPE, with per-shape achieved TFLOP/s and MFU.

This answers the question the category totals can't: WHICH convolutions
run below the MXU's capability. Method:
  1. compile the exact bench-config K-dispatch program (same builder as
     bench.py / tools/trace_train_step.py) and take compiled.as_text();
  2. parse every fusion instruction that computes a convolution,
     recording the conv's operand/result shapes + window;
  3. run one traced dispatch, sum device time per instruction name, and
     join on the fusion name.

Output: one JSON line per conv shape group (summed over the unrolled
timesteps and the K-step while body), sorted by total time, with
analytic FLOPs (2 * out_elems * kh * kw * cin) and MFU vs v5e bf16
peak.

Run on TPU:
  python tools/trace_train_step.py --batch 32  # warm the compile cache
  python tools/conv_shape_attribution.py --batch 32
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pivp_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pivp_tpu.config import ModelConfig  # noqa: E402
from pivp_tpu.data import synthetic  # noqa: E402
from pivp_tpu.parallel import mesh as mesh_lib  # noqa: E402
from pivp_tpu.parallel import train_step as ts_lib  # noqa: E402
from pivp_tpu.utils import flops as flops_lib  # noqa: E402
from tools import trace_top_ops  # noqa: E402

SEQ, CONTEXT, K = 10, 2, 25

_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%([\w\.\-]+)\s*=\s*\(?(\w+)\[([\d,]*)\]")
_PARAM_RE = re.compile(r"%([\w\.\-]+):\s*\w+\[([\d,]*)\]")
_HDR_RE = re.compile(r"^(?:ENTRY\s+)?%([\w\.\-]+)\s*\(")
_CONV_LINE_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%([\w\.\-]+)\s*=\s*\w+\[([\d,]*)\]"
    r"[^=]*?convolution\(([^)]*)\)")
_FUSION_RE = re.compile(
    r"%([\w\.\-]+)\s*=\s*[^=\n]*\sfusion\([^\n]*?calls=%([\w\.\-]+)")


def build(batch: int, merge_output_convs: bool = True):
    cfg = ModelConfig(model_type="CDNA", num_masks=10,
                      sequence_length=SEQ, context_frames=CONTEXT,
                      scheduled_sampling_k=900.0,
                      compute_dtype="bfloat16", use_pallas=True,
                      scan_unroll=SEQ - 1,
                      lstm_gate_compute="compute",
                      merge_output_convs=merge_output_convs)
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = ts_lib.make_train_multi(cfg, opt, mesh)

    imgs, acts, stas = synthetic.generate_sequences(batch * K, SEQ)

    def stack(x):
        return np.ascontiguousarray(
            x.reshape(K, batch, *x.shape[1:]).swapaxes(1, 2))

    batches = jax.device_put(tuple(
        stack(x) for x in (imgs, acts, stas)))
    return multi, state, batches


def parse_conv_fusions(hlo_text: str):
    """Map fusion-instruction name -> list of conv descriptors found in
    the computation that fusion calls.

    HLO layout: `%name = ty fusion(...), kind=..., calls=%comp` at the
    callsite; each `%comp` computation body contains
    `%x = ty[out] convolution(%a, %b), window=..., dim_labels=...` —
    operands are BARE NAMES (no inline shapes), so operand shapes are
    resolved through a global name->shape map built from every
    instruction definition and computation-parameter declaration.
    """
    lines = hlo_text.splitlines()

    # 0. global instruction/param name -> result shape (digits only).
    shape_map: dict = {}
    for line in lines:
        m = _INSTR_RE.match(line)
        if m:
            shape_map[m.group(1)] = m.group(3)
    for m in _PARAM_RE.finditer(hlo_text):
        shape_map.setdefault(m.group(1), m.group(2))

    # 1. computation name -> conv list (track the enclosing computation).
    comp_convs: dict = collections.defaultdict(list)
    cur_comp = None
    for line in lines:
        if line.rstrip().endswith("{") and "=" not in line.split("(")[0]:
            if line.startswith("ENTRY"):
                cur_comp = "__entry__"
                continue
            hm = _HDR_RE.match(line.strip())
            if hm:
                cur_comp = hm.group(1)
            continue
        cm = _CONV_LINE_RE.match(line)
        if not cm:
            continue
        ops = [o.strip().lstrip("%") for o in cm.group(3).split(",")]
        wm = re.search(r"window=\{([^}]*)\}", line)
        dm = re.search(r"dim_labels=(\S+?)[,\s]", line)
        om = re.search(r'op_name="([^"]*)"', line)
        comp_convs[cur_comp].append({
            "name": cm.group(1), "out": cm.group(2),
            "lhs": shape_map.get(ops[0], ""),
            "rhs": shape_map.get(ops[1], "") if len(ops) > 1 else "",
            "window": wm.group(1) if wm else "",
            "dims": dm.group(1) if dm else "",
            "op_name": om.group(1) if om else "",
        })

    # 2. fusion instruction name -> computation name; join.
    out = {}
    for m in _FUSION_RE.finditer(hlo_text):
        if m.group(2) in comp_convs:
            out[m.group(1)] = comp_convs[m.group(2)]
    # bare convolutions (outside any fusion) attribute to themselves
    for comp, descs in comp_convs.items():
        for d in descs:
            out.setdefault(d["name"], [d])
    return out


def conv_flops(desc) -> int:
    """Exact analytic MACs*2 for any conv (fwd, bwd-to-input,
    bwd-to-weight): 2 * out_elems * reduction, where the reduction size
    is prod(rhs) / rhs[o] with the 'o' dim read from dim_labels (e.g.
    b01f_01io->b01f). Falls back to last-dim when labels are absent."""
    out = [int(x) for x in desc["out"].split(",") if x]
    rhs = [int(x) for x in desc["rhs"].split(",") if x]
    if not out or not rhs:
        return 0
    o_pos = len(rhs) - 1
    dims = desc.get("dims", "")
    if "_" in dims:
        rhs_labels = dims.split("_")[1].split("->")[0]
        if "o" in rhs_labels and len(rhs_labels) == len(rhs):
            o_pos = rhs_labels.index("o")
    out_elems = int(np.prod(out))
    reduction = int(np.prod(rhs)) // max(rhs[o_pos], 1)
    return 2 * out_elems * reduction


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--merge_output_convs", type=int, default=1)
    a = ap.parse_args()

    multi, state, batches = build(a.batch, bool(a.merge_output_convs))
    rng = jax.random.PRNGKey(1)

    # Reach the underlying jitted callable for lower/compile text.
    lowered = None
    try:
        jitted = multi.__wrapped__  # not set; fall through
    except AttributeError:
        jitted = None
    # make_train_multi returns a closure around the jitted fn; trace via
    # AOT on the closure's cell contents.
    if jitted is None:
        for cell in multi.__closure__ or ():
            obj = cell.cell_contents
            if hasattr(obj, "lower"):
                jitted = obj
    assert jitted is not None, "could not find the jitted callable"
    lowered = jitted.lower(state, batches, jnp.float32(0.0), rng,
                           jnp.int32(K))
    compiled = lowered.compile()
    hlo = compiled.as_text()
    conv_map = parse_conv_fusions(hlo)

    state2, metrics = multi(state, batches, jnp.float32(0.0), rng)
    float(metrics["loss"][-1])              # warmup barrier

    tdir = tempfile.mkdtemp(prefix=f"convattr-b{a.batch}-")
    try:
        with jax.profiler.trace(tdir):
            state2, metrics = multi(state2, batches, jnp.float32(K), rng)
            float(metrics["loss"][-1])
        xs = trace_top_ops.load_xspace(trace_top_ops.find_xplane(tdir))
        totals, cats, span = trace_top_ops.device_op_totals(xs)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)

    # Group trace time by conv shape signature.
    groups: dict = collections.defaultdict(
        lambda: {"ms": 0.0, "ops": 0, "flops": 0})
    unattributed_conv_ms = 0.0
    for name, ps in totals.items():
        ms = ps / 1e9 / K
        if name in conv_map:
            descs = conv_map[name]
            sig = " + ".join(
                f"[{d['lhs']}]*[{d['rhs']}]->[{d['out']}] {d['window']}"
                + (" BWD" if "transpose" in d.get("op_name", "") else "")
                for d in descs)
            g = groups[sig]
            g["ms"] += ms
            g["ops"] += 1
            g["flops"] = sum(conv_flops(d) for d in descs)
        elif "conv" in name:
            unattributed_conv_ms += ms

    rows = []
    for sig, g in groups.items():
        tf = g["flops"] * g["ops"] / (g["ms"] / 1e3) / 1e12 \
            if g["ms"] else 0.0
        rows.append({
            "shape": sig, "ms_per_step": round(g["ms"], 3),
            "n_ops": g["ops"],
            "flops_per_op": g["flops"],
            "achieved_tflops": round(tf, 1),
            "mfu": round(flops_lib.mfu(tf), 3),
        })
    rows.sort(key=lambda r: -r["ms_per_step"])
    total_conv_ms = sum(r["ms_per_step"] for r in rows)
    print(json.dumps({
        "batch": a.batch,
        "total_attributed_conv_ms_per_step": round(total_conv_ms, 2),
        "unattributed_conv_ms_per_step": round(unattributed_conv_ms, 3),
    }))
    for r in rows[:a.top]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()

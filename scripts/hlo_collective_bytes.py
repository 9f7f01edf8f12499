"""Extract per-step collective traffic from the compiled HLO of the fused
sharded training step — the ground truth for bench.py's ICI psum model.

The north-star projection (bench.py) adds a hand model for the 1-D mesh's
psums: ``2·(n-1)/n`` of the f32 (spots × genes_padded) projection over a
ring at 100 GB/s. This script validates the *bytes moved* side of that
model against what XLA actually emits: it AOT-lowers one fused sharded
training step over an ``n``-device CPU mesh (``shard_map`` produces the
same collective ops as on TPU; only the codegen differs), walks the
optimized HLO, and sums the collectives reachable from the training scan's
while-body — i.e. the per-step traffic — converting each op to ring wire
bytes per chip:

    all-reduce          2·(n-1)/n · buffer
    all-gather            (n-1)/n · result
    reduce-scatter        (n-1)   · result   (= (n-1)/n · operand)
    collective-permute              result
    all-to-all            (n-1)/n · buffer

The collective buffers are (spots × genes) — independent of the cell
count — so lowering with a small cell axis yields exactly the north-star's
per-step collective bytes without 20 GB arrays.

Prints one JSON object. Run standalone or let bench.py invoke it as a
subprocess (it must own the interpreter: the virtual-device flag is read
at backend init).
"""

import argparse
import json
import math
import os
import re
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cells", type=int, default=1024,
                   help="cell count for lowering (collective bytes are "
                        "independent of it)")
    p.add_argument("--spots", type=int, default=50_000)
    p.add_argument("--genes", type=int, default=249)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--mesh", choices=["1d", "2d", "multislice"], default="1d",
                   help="'multislice' lowers over a ('slice','cell') mesh "
                        "(devices/8 slices x 8 chips) — the DCN leg's "
                        "program (VERDICT r4 #6)")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--verbose", action="store_true",
                   help="also list every collective op found")
    return p.parse_args(argv)


# ---------------------------------------------------------------------------
# HLO text analysis (no jax needed)
# ---------------------------------------------------------------------------

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}
_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\]")
_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def _shapes_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _wire_bytes(op: str, result_bytes: int, n: int) -> float:
    """Ring wire bytes per chip for one executed collective."""
    if op == "all-reduce":
        return 2.0 * (n - 1) / n * result_bytes
    if op == "all-gather":
        return (n - 1) / n * result_bytes
    if op == "reduce-scatter":
        return float(n - 1) * result_bytes
    if op == "collective-permute":
        return float(result_bytes)
    if op == "all-to-all":
        return (n - 1) / n * result_bytes
    raise ValueError(op)


_CALL_RE = re.compile(
    r"(?:body|condition|to_apply|branches)=\{?%?([\w.\-]+)"
)
_BRANCHES_RE = re.compile(r"branch_computations=\{([^}]*)\}")
_CALLS_RE = re.compile(r"calls=\{?%?([\w.\-]+)")


def split_computations(hlo: str):
    """{name: body_text} for every computation in an HLO module dump."""
    comps = {}
    name, lines = None, []
    for line in hlo.splitlines():
        stripped = line.strip()
        if not line.startswith((" ", "\t")) and "{" in line and (
            stripped.startswith("%") or stripped.startswith("ENTRY")
        ):
            m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)", stripped)
            name, lines = m.group(1), []
            comps[name] = lines
        elif name is not None:
            if stripped == "}":
                name = None
            else:
                lines.append(line)
    return {k: "\n".join(v) for k, v in comps.items()}


def analyze_hlo(hlo: str, n_devices: int, verbose: bool = False):
    """(per_step, total) collective summaries of one HLO module.

    ``per_step`` covers collectives reachable from any while-loop body —
    the ops that run once per training step; ``total`` covers the whole
    module (setup + one executed step for a length-1 scan).
    """
    comps = split_computations(hlo)

    refs = {}  # computation → referenced computations
    bodies = set()
    for cname, body in comps.items():
        out = set()
        for line in body.splitlines():
            out.update(_CALL_RE.findall(line))
            for grp in _BRANCHES_RE.findall(line):
                out.update(p.strip().lstrip("%") for p in grp.split(","))
            out.update(_CALLS_RE.findall(line))
            m = re.search(r"body=%?([\w.\-]+)", line)
            if m and " while(" in line:
                bodies.add(m.group(1))
        refs[cname] = out & set(comps)

    # computations reachable from any while body
    reach = set()
    stack = list(bodies & set(comps))
    while stack:
        c = stack.pop()
        if c in reach:
            continue
        reach.add(c)
        stack.extend(refs.get(c, ()))

    def group_size(line):
        """Devices participating in this collective (its ring length):
        explicit groups ``{{0,2},{1,3}}`` or iota ``[2,4]<=[8]`` (2 groups
        of 4); empty/absent groups mean all devices."""
        m = re.search(r"replica_groups=\{\{([^}]*)\}", line)
        if m:
            return len([x for x in m.group(1).split(",") if x.strip()])
        m = re.search(r"replica_groups=\[(\d+),(\d+)\]<=", line)
        if m:
            return int(m.group(2))
        return n_devices

    op_re = re.compile(
        r"=\s+(.*?)\s+(" + "|".join(_COLLECTIVES)
        + r")(-start|-done)?\(([^)]*)\)"
    )

    def collect(names):
        buf = wire = 0.0
        ops = []
        by_group = {}
        for cname in names:
            for line in comps[cname].splitlines():
                m = op_re.search(line)
                if not m:
                    continue
                result_text, op, suffix, operand_text = m.groups()
                if suffix == "-done":
                    # async pairs: count the start only
                    continue
                g = group_size(line)
                if g <= 1:
                    continue  # degenerate single-device "collective"
                if suffix == "-start":
                    # a start op's result type is a tuple (operand alias,
                    # result[, context]) — derive the sync-op result bytes
                    # from the operand shapes instead of double counting
                    b_op = _shapes_bytes(operand_text)
                    if op == "all-gather":
                        b = b_op * g
                    elif op == "reduce-scatter":
                        b = b_op // g
                    else:
                        b = b_op
                else:
                    b = _shapes_bytes(result_text)
                w = _wire_bytes(op, b, g)
                buf += b
                wire += w
                grp = by_group.setdefault(
                    g, {"count": 0, "buffer_bytes": 0.0, "wire_bytes": 0.0}
                )
                grp["count"] += 1
                grp["buffer_bytes"] += b
                grp["wire_bytes"] += w
                if verbose:
                    ops.append({"computation": cname, "op": op, "group": g,
                                "buffer_bytes": b, "wire_bytes": w})
        return buf, wire, ops, by_group

    step_buf, step_wire, step_ops, step_groups = collect(sorted(reach))
    tot_buf, tot_wire, tot_ops, tot_groups = collect(sorted(comps))
    # with a length-1 scan XLA inlines the loop body, so every collective in
    # the module executes exactly once — the module total IS the per-step
    # traffic (setup emits none; the entry's collectives are the step's)
    if step_wire == 0.0:
        attribution = "module_total (scan inlined at length 1)"
        step_buf, step_wire, step_ops, step_groups = (
            tot_buf, tot_wire, tot_ops, tot_groups
        )
    else:
        attribution = "while_body reachability"
    out = {
        "per_step": {
            "buffer_bytes": step_buf,
            "wire_bytes_per_chip": step_wire,
            "by_group_size": {str(k): v for k, v in sorted(step_groups.items())},
        },
        "module_total": {"buffer_bytes": tot_buf, "wire_bytes_per_chip": tot_wire},
        "attribution": attribution,
        "n_while_bodies": len(bodies),
    }
    if verbose:
        out["ops"] = step_ops
    return out


# ---------------------------------------------------------------------------
# lowering
# ---------------------------------------------------------------------------


def lower_step_hlo(cells, spots, genes, n_devices, mesh_kind, compute_dtype):
    """Optimized HLO text of ONE fused sharded training step (scan length 1)
    over an ``n_devices`` CPU mesh."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from tangram_tpu.ops.losses import LossWeights, MapperData
    from tangram_tpu.parallel.fused_sharded import fit_mapping_fused_sharded

    devices = np.asarray(jax.devices("cpu")[:n_devices])
    if mesh_kind == "1d":
        mesh = Mesh(devices.reshape(-1), axis_names=("cell",))
    elif mesh_kind == "multislice":
        # the two-slice pod layout of bench.py's two_slice_projection:
        # ("slice", "cell") with 8 chips per slice
        mesh = Mesh(devices.reshape(n_devices // 8, 8),
                    axis_names=("slice", "cell"))
    else:
        mesh = Mesh(devices.reshape(n_devices // 2, 2),
                    axis_names=("cell", "spot"))
    lw = LossWeights(lambda_g1=1.0, lambda_d=1.0)

    def one_step(M, S, G, d):
        data = MapperData(S=S, G=G, d=d)
        params, history = fit_mapping_fused_sharded(
            M, data, lw, 1, 0.1, mesh=mesh,
            compute_dtype=jnp.dtype(compute_dtype),
        )
        return params, history["main_loss"]

    arg = jax.ShapeDtypeStruct
    lowered = jax.jit(one_step).lower(
        arg((cells, spots), jnp.float32),
        arg((cells, genes), jnp.float32),
        arg((spots, genes), jnp.float32),
        arg((spots,), jnp.float32),
    )
    return lowered.compile().as_text()


def main(argv=None):
    args = parse_args(argv)
    hlo = lower_step_hlo(
        args.cells, args.spots, args.genes, args.devices, args.mesh,
        args.compute_dtype,
    )
    result = analyze_hlo(hlo, args.devices, verbose=args.verbose)
    genes_padded = -(-args.genes // 128) * 128
    result["config"] = {
        "cells": args.cells, "spots": args.spots, "genes": args.genes,
        "genes_padded": genes_padded, "devices": args.devices,
        "mesh": args.mesh, "compute_dtype": args.compute_dtype,
    }
    # the bench model's wire bytes for the same configuration (Y psum only)
    n = args.devices
    result["bench_model_wire_bytes"] = (
        2.0 * (n - 1) / n * args.spots * genes_padded * 4
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())

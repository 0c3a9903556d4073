"""Per-component HBM bytes ledger for the fused train step (VERDICT r4
item 3: profile_step buckets device TIME; nothing attributed BYTES — and the
music preset's remaining 1.26x speed-of-light gap is a bytes question).

Compile-only: lowers + compiles the step (no device execution, so it can run
alongside a live measurement queue), parses the optimized HLO text, and for
every instruction in the entry computation charges

    bytes = output buffer size + sum(operand buffer sizes)

— the same operands+outputs model XLA's own cost_analysis() uses for its
aggregate "bytes accessed" (a post-fusion HBM-traffic proxy, not a hardware
counter).  Async pairs charge only the -start half; aliasing ops (bitcast,
tuple plumbing) are free.  Instructions are attributed to components via
metadata={op_name=...}; fusions without their own metadata inherit the
dominant op_name of their called computation.

Caveat: traffic inside while-loop bodies (scan presets: 3src bilstm,
streaming) is charged once, not x trip-count — same as cost_analysis.  The
conv presets this ledger targets (music, wsj0) have no entry-level loops.

Usage:  python scripts/bytes_ledger.py [preset] [batch] [--set k=v ...]

Prints the per-bucket GB/step table, the top byte-producing scopes and
instructions, and ONE final JSON line (queue-runner contract).
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s4": 1, "u4": 1,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4,
    "f64": 8, "s64": 8, "u64": 8, "c64": 8,
    "c128": 16, "token": 0, "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")
# Shape leaf WITH its layout braces: minor-to-major order, tiling
# T(sublane,lane), optional bf16/int8 packing tuple, memory space S(n).
_SHAPE_LAYOUT_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\](?:\{([^{}]*(?:\([^)]*\)[^{}]*)*)\})?")
_TILE_RE = re.compile(r"T\(([\d,]+)\)(?:\((\d+),\d+\))?")
_SPACE_RE = re.compile(r"S\((\d+)\)")
# Aliasing / metadata-only opcodes — XLA charges them no traffic.  "-done"
# halves of async pairs are also free (the -start is charged).
_FREE_OPS = {"bitcast", "get-tuple-element", "tuple", "parameter",
             "constant", "after-all", "opt-barrier", "partition-id",
             "replica-id"}
_NAME_RE = re.compile(r"%([\w.\-]+)")
_META_RE = re.compile(r'metadata=\{[^}]*op_name="([^"]*)"')
_CALLS_RE = re.compile(r"(?:calls|to_apply)=%([\w.\-]+)")
_INSTR_HEAD_RE = re.compile(r"^(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(.*)$")
_SIMPLE_SHAPE_RE = re.compile(
    r"^([a-z0-9]+\[[\d,]*\](?:\{[^}]*\})?(?::S\(\d+\))?)\s*")


def shape_bytes(shape_str: str) -> int:
    """Total LOGICAL buffer bytes of a shape string; tuples sum leaves."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def shape_pbytes(shape_str: str) -> int:
    """Total PHYSICAL HBM bytes of a shape string (round 5): applies the
    layout's tiling — the minor dim pads to the lane tile (128) and the
    second-minor to the sublane tile (8, x pack factor for sub-4-byte
    types) — and charges buffers placed in scoped memories (S(1) VMEM /
    S(2) SMEM) ZERO HBM traffic.  This is the accounting that exposes
    lane-padding waste: a (..., 64) bf16 activation physically streams 2x
    its logical bytes, which the logical ledger cannot see (and which the
    round-5 fold(1,2)+c128 music attack exploits)."""
    total = 0
    for dtype, dims, layout in _SHAPE_LAYOUT_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES or _DTYPE_BYTES[dtype] == 0:
            continue
        if _SPACE_RE.search(layout):
            sp = _SPACE_RE.search(layout).group(1)
            if sp != "0":
                continue                      # VMEM/SMEM: no HBM traffic
        dsz = _DTYPE_BYTES[dtype]
        dim_list = [int(d) for d in dims.split(",")] if dims else []
        if not dim_list:
            total += dsz
            continue
        tm = _TILE_RE.search(layout)
        # minor-to-major order (defaults to row-major when absent)
        mtm_str = layout.split(":", 1)[0] if layout else ""
        if re.fullmatch(r"[\d,]+", mtm_str or ""):
            mtm = [int(x) for x in mtm_str.split(",")]
        else:
            mtm = list(range(len(dim_list)))[::-1]
        if tm:
            tile = [int(x) for x in tm.group(1).split(",")]
            pack = int(tm.group(2)) if tm.group(2) else 1
        else:
            tile, pack = [8, 128], (4 // dsz if dsz < 4 else 1) or 1
        padded = list(dim_list)
        # pad the most-minor dims against the tile, minor-first
        for t_idx, d_idx in zip(range(len(tile) - 1, -1, -1),
                                mtm[: len(tile)]):
            t = tile[t_idx]
            if t_idx == 0:
                t *= max(pack, 1)             # packed sublane tile
            padded[d_idx] = -(-padded[d_idx] // t) * t
        n = 1
        for d in padded:
            n *= d
        total += n * dsz
    return total


def _split_shape(rest: str):
    """Split '<shape> <opcode>(...)' -> (shape_str, remainder)."""
    if rest.startswith("("):
        depth = 0
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return rest[: i + 1], rest[i + 1:].lstrip()
        return rest, ""
    m = _SIMPLE_SHAPE_RE.match(rest)
    if m:
        return m.group(1), rest[m.end():]
    return "", rest


def _operand_span(remainder: str):
    """Text inside the opcode's balanced operand parens."""
    start = remainder.find("(")
    if start < 0:
        return ""
    depth = 0
    for i in range(start, len(remainder)):
        if remainder[i] == "(":
            depth += 1
        elif remainder[i] == ")":
            depth -= 1
            if depth == 0:
                return remainder[start + 1: i]
    return remainder[start + 1:]


def parse_hlo(hlo_text: str):
    """Parse all computations: per-computation instruction records."""
    comps: dict = {}
    cur = None
    for raw in hlo_text.splitlines():
        s = raw.strip()
        if s.endswith("{") and " = " not in s and ("(" in s or
                                                   s.startswith("ENTRY")):
            is_entry = s.startswith("ENTRY")
            hdr = s[5:].strip() if is_entry else s
            name = hdr.split(" ")[0].split("(")[0].lstrip("%")
            cur = comps.setdefault(
                name, {"instrs": [], "entry": is_entry})
            continue
        if cur is None:
            continue
        m = _INSTR_HEAD_RE.match(s)
        if not m:
            continue
        name, rest = m.group(1), m.group(2)
        shape_str, remainder = _split_shape(rest)
        om = re.match(r"([\w\-]+)\(", remainder)
        if not om:
            continue
        opcode = om.group(1)
        mm = _META_RE.search(remainder)
        cm = _CALLS_RE.search(remainder)
        cur["instrs"].append({
            "name": name, "opcode": opcode,
            "out_bytes": shape_bytes(shape_str),
            "out_pbytes": shape_pbytes(shape_str),
            "operands": _NAME_RE.findall(_operand_span(remainder)),
            "op_name": mm.group(1) if mm else "",
            "calls": cm.group(1) if cm else "",
        })
    return comps


def comp_dominant_meta(comps: dict) -> dict:
    """Per computation: the op_name carried by its largest instruction."""
    out = {}
    for cname, comp in comps.items():
        best, best_bytes = "", -1
        for ins in comp["instrs"]:
            if ins["op_name"] and ins["out_bytes"] > best_bytes:
                best, best_bytes = ins["op_name"], ins["out_bytes"]
        out[cname] = best
    return out


def _instr_bytes(ins: dict, sizes: dict, comps: dict,
                 key: str = "out_bytes") -> int:
    """Bytes charged to one instruction, with slice/async/copy semantics:

    - slice/dynamic-slice reads only the region it outputs  -> 2x output
    - dynamic-update-slice writes only the update region    -> 2x update
    - async-start wrapping a slice (VMEM weight prefetch): charge the inner
      root, NOT the full operand per slice (a kernel sliced N ways would
      otherwise be charged N times) and NOT the output tuple's operand alias
    - copy-start tuple is (dst, src-alias, sync)            -> 2x dst
    - everything else: output + sum(operand buffer sizes)
    """
    opcode = ins["opcode"]
    if opcode in ("slice", "dynamic-slice", "gather"):
        return 2 * ins[key]
    if opcode == "dynamic-update-slice":
        upd = sizes.get(ins["operands"][1], 0) if len(
            ins["operands"]) > 1 else 0
        return 2 * upd
    if opcode == "copy-start":
        # output tuple (dst, src-alias, sync): src read + dst write
        # == dst+src leaves ~= the tuple total (sync scalar negligible).
        return ins[key]
    if opcode == "async-start" and ins["calls"] in comps:
        inner = comps[ins["calls"]]["instrs"]
        root = inner[-1] if inner else None
        if root is not None:
            inner_sizes = {i["name"]: i[key] for i in inner}
            return _instr_bytes(root, inner_sizes, comps, key)
    return ins[key] + sum(
        sizes.get(op, 0) for op in ins["operands"])


def entry_ledger(comps: dict):
    """Yield (instr_name, opcode, logical_bytes, physical_bytes, op_name)
    for traffic-bearing entry-computation instructions."""
    entry = next((c for c in comps.values() if c["entry"]), None)
    if entry is None:
        return
    sizes = {i["name"]: i["out_bytes"] for i in entry["instrs"]}
    psizes = {i["name"]: i["out_pbytes"] for i in entry["instrs"]}
    dom = comp_dominant_meta(comps)
    for ins in entry["instrs"]:
        opcode = ins["opcode"]
        if opcode in _FREE_OPS or opcode.endswith("-done"):
            continue
        total = _instr_bytes(ins, sizes, comps)
        ptotal = _instr_bytes(ins, psizes, comps, key="out_pbytes")
        op_name = ins["op_name"]
        if not op_name and ins["calls"]:
            op_name = dom.get(ins["calls"], "")
        yield ins["name"], opcode, total, ptotal, op_name


def bucket(op: str) -> str:
    """Same coarse attribution as profile_step.py's time buckets."""
    if "Discriminator" in op:
        return "D bwd" if "transpose(jvp" in op else "D fwd"
    if "Generator" in op or "MaskHead" in op:
        return "G bwd" if "transpose(jvp" in op else "G fwd"
    low = op.lower()
    for k in ("stft", "fft", "sample_bank", "mix_sources", "pallas", "roll"):
        if k in low:
            return "DSP/data"
    if "pit" in low or "argmin" in low:
        return "PIT"
    if "adam" in low or "optax" in low or "scale_by" in low:
        return "optimizer"
    return "other"


def scope_key(op: str) -> str:
    """Collapse an op_name path to its model-relevant trailing segments."""
    tag = "bwd" if "transpose(jvp" in op else "fwd"
    parts = [p for p in op.split("/") if p and not p.startswith(
        ("jit(", "jvp(", "transpose("))]
    return ("/".join(parts[-3:]) if parts else "?") + f" [{tag}]"


def main(argv) -> int:
    from gan_sass_tf_tpu import config as config_lib
    from gan_sass_tf_tpu.cli import _apply_overrides
    from gan_sass_tf_tpu.train import Experiment

    overrides, pos = [], []
    i = 0
    while i < len(argv):
        if argv[i] == "--set" and i + 1 < len(argv):
            overrides.append(argv[i + 1]); i += 2
        else:
            pos.append(argv[i]); i += 1
    preset = pos[0] if pos else "music_complex_44k"
    batch = int(pos[1]) if len(pos) > 1 else None

    cfg = config_lib.get_config(preset)
    data_kw = {"dataset": "synthetic"}
    if preset == "music_complex_44k":
        data_kw["slot_profiles"] = ("vocal", "accomp")
    cfg = cfg.replace(
        data=cfg.data.__class__(**{**cfg.data.__dict__, **data_kw}),
        mesh=cfg.mesh.__class__(data_axis_size=-1),
    )
    if batch is not None:
        cfg = cfg.replace(
            train=cfg.train.__class__(**{**cfg.train.__dict__,
                                         "batch_size": batch}))
    cfg = _apply_overrides(cfg, list(overrides))
    exp = Experiment(cfg, workdir=None)

    compiled = exp._train_step.lower(
        exp.state, exp._bank, exp._train_rng).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    ca_bytes = float(ca.get("bytes accessed", 0.0))

    comps = parse_hlo(compiled.as_text())
    buckets: collections.Counter = collections.Counter()
    pbuckets: collections.Counter = collections.Counter()
    scopes: collections.Counter = collections.Counter()
    instrs: list = []
    for name, opcode, nbytes, pbytes, op in entry_ledger(comps):
        b = bucket(op) if op else "UNATTR"
        buckets[b] += nbytes
        pbuckets[b] += pbytes
        scopes[scope_key(op) if op else f"UNATTR:{opcode}"] += pbytes
        instrs.append((pbytes, opcode, op[:110] or name))

    total = sum(buckets.values())
    ptotal = sum(pbuckets.values())
    print(f"{preset} batch={cfg.train.batch_size}: ledger "
          f"{ptotal / 1e9:.2f} GB/step PHYSICAL (tiled layouts, scoped "
          f"memories free) / {total / 1e9:.2f} GB logical "
          f"(cost_analysis aggregate {ca_bytes / 1e9:.2f} GB)")
    print("per-bucket GB/step (physical, logical):")
    for k, v in pbuckets.most_common():
        print(f"  {v / 1e9:8.3f} GB  {buckets[k] / 1e9:8.3f} GB  "
              f"{100 * v / max(ptotal, 1):5.1f}%  {k}")
    print("top byte-producing scopes (physical):")
    for k, v in scopes.most_common(20):
        print(f"  {v / 1e9:8.3f} GB  {k}")
    print("top instructions (physical):")
    for pbytes, opcode, op in sorted(instrs, reverse=True)[:15]:
        print(f"  {pbytes / 1e9:8.3f} GB  {opcode:12s} {op}")

    print(json.dumps({
        "preset": preset, "batch": cfg.train.batch_size,
        "ledger_physical_gb_per_step": round(ptotal / 1e9, 2),
        "ledger_gb_per_step": round(total / 1e9, 2),
        "cost_analysis_gb_per_step": round(ca_bytes / 1e9, 2),
        "buckets_physical_gb": {k: round(v / 1e9, 3) for k, v in
                                pbuckets.most_common()},
        "buckets_gb": {k: round(v / 1e9, 3) for k, v in
                       buckets.most_common()},
        "top_scopes_physical_gb": {k: round(v / 1e9, 3) for k, v in
                                   scopes.most_common(12)},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

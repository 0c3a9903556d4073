"""HLO bytes-ledger parser tests (round-5 tooling: scripts/bytes_ledger.py).

The ledger feeds the roofline's HBM-traffic proxy, so its parsing rules are
load-bearing: shape-string byte math (incl. tuples), slice charging
(2x output, NOT the full operand), and free-op skipping.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp

_SPEC = importlib.util.spec_from_file_location(
    "bytes_ledger",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "bytes_ledger.py"))
bl = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bl)


def test_shape_bytes():
    assert bl.shape_bytes("f32[2,3]{1,0}") == 24
    assert bl.shape_bytes("bf16[8,128]") == 2048
    assert bl.shape_bytes("pred[]") == 1
    # tuples sum leaves; layout/memory-space annotations are ignored
    assert bl.shape_bytes(
        "(f32[4]{0:T(256)}, u32[]{:S(2)})") == 16 + 4


def test_split_shape_tuple_with_memory_space():
    shape, rest = bl._split_shape(
        "((f32[3,3]{1,0}), f32[1,3]{1,0:T(8,128)S(1)}, s32[]{:S(2)}) "
        "async-start(%p), calls=%c")
    assert shape.startswith("((") and shape.endswith(")")
    assert rest.startswith("async-start(")


def test_entry_ledger_on_compiled_hlo():
    """Parse a real compiled module: totals positive, every yielded
    instruction traffic-bearing, dot attributed via metadata."""

    @jax.jit
    def f(x, w):
        h = jnp.dot(x, w)
        return jnp.tanh(h)[:, :8]    # slice at the end

    x = jnp.zeros((128, 64), jnp.float32)
    w = jnp.zeros((64, 32), jnp.float32)
    txt = jax.jit(f).lower(x, w).compile().as_text()
    comps = bl.parse_hlo(txt)
    assert any(c["entry"] for c in comps.values())
    rows = list(bl.entry_ledger(comps))
    assert rows, "no traffic-bearing instructions parsed"
    total = sum(r[2] for r in rows)
    # At least the dot operands + result must be charged.
    assert total >= (128 * 64 + 64 * 32 + 128 * 32) * 4
    for name, opcode, nbytes, pbytes, _op in rows:
        assert opcode not in bl._FREE_OPS
        assert nbytes >= 0, (name, opcode)
        # physical (tile-padded) can never be below logical for HBM bufs,
        # but scoped-memory (VMEM/SMEM) buffers are physically free
        assert pbytes >= 0, (name, opcode)


def test_shape_pbytes_lane_padding():
    # (…, 64) bf16: minor dim pads to the 128-lane tile -> 2x logical
    s = "bf16[8,100,64]{2,1,0:T(8,128)(2,1)}"
    assert bl.shape_bytes(s) == 8 * 100 * 64 * 2
    # minor 64->128, second-minor 100 -> pad to 16-mult (8x2 packed) = 112
    assert bl.shape_pbytes(s) == 8 * 112 * 128 * 2
    # perfectly tiled f32: physical == logical
    assert bl.shape_pbytes("f32[4,8,128]{2,1,0:T(8,128)}") == 4 * 8 * 128 * 4
    # non-row-major minor_to_major: dim 1 is minor (pads to 128),
    # dim 2 is second-minor (pads to 8)
    assert (bl.shape_pbytes("f32[4,100,5]{1,2,0:T(8,128)}")
            == 4 * 128 * 8 * 4)


def test_shape_pbytes_scoped_memory_free():
    # VMEM (S(1)) and SMEM (S(2)) buffers cost no HBM traffic
    assert bl.shape_pbytes("bf16[8,96,64]{1,2,0:T(8,128)(2,1)S(1)}") == 0
    assert bl.shape_pbytes("u32[]{:S(2)}") == 0
    # tuple mixing HBM and scoped leaves charges only the HBM leaf
    assert (bl.shape_pbytes("(f32[8,128]{1,0:T(8,128)}, "
                            "f32[8,128]{1,0:T(8,128)S(1)})")
            == 8 * 128 * 4)


def test_slice_charged_two_x_output():
    ins = {"name": "s", "opcode": "slice", "out_bytes": 100,
           "operands": ["big"], "op_name": "", "calls": ""}
    assert bl._instr_bytes(ins, {"big": 10_000}, {}) == 200


def test_async_start_charges_inner_root_not_operand():
    comps = {"async_computation.1": {"entry": False, "instrs": [
        {"name": "p0", "opcode": "parameter", "out_bytes": 9000,
         "operands": [], "op_name": "", "calls": ""},
        {"name": "slice.1", "opcode": "slice", "out_bytes": 1000,
         "operands": ["p0"], "op_name": "", "calls": ""},
    ]}}
    ins = {"name": "a", "opcode": "async-start", "out_bytes": 10_000,
           "operands": ["kernel"], "op_name": "",
           "calls": "async_computation.1"}
    assert bl._instr_bytes(ins, {"kernel": 9000}, comps) == 2000

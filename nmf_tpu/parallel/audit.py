"""Static collective-placement audit for sharded train/eval steps.

The reference has no distributed layer at all (SURVEY.md section 2.3), so
there is nothing to match here; this is TPU-native tooling for the mesh
design in ``parallel/mesh.py``. The design contract of that layer is:
rays sharded, params replicated, and the ONLY cross-chip traffic is the
gradient all-reduce (sized like the parameters) plus scalar metric
reductions. GSPMD makes it easy to silently violate that contract — one
mis-propagated sharding and the partitioner inserts an all-gather of a
batch-sized (or worse, field-sized) tensor on every step, which would
ride ICI fine on a benchmark and then dominate step time at scale.

``audit_collectives`` parses the *optimized* HLO of a compiled step and
reports every collective with its payload bytes, so a test can pin the
traffic to O(param bytes) at compile time — no multi-chip hardware
needed (works on the virtual ``--xla_force_host_platform_device_count``
CPU mesh the test suite uses).
"""
import re
from typing import Any, Dict

_COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)
# "all-reduce-start"/"-done" (async pairs) must not double count: only the
# -start carries the payload. Plain fused "all-reduce" has no suffix.
_OP_RE = re.compile(
    r"=\s*(?P<shape>.*?)\s"
    r"(?P<op>" + "|".join(_COLLECTIVE_OPS) + r")(?P<suffix>-start|-done)?"
    r"(?:\.\d+)?\(")
_SHAPE_RE = re.compile(r"(?P<dtype>pred|[bfsu]\d+|f8e\d\w*)\[(?P<dims>[\d,]*)\]")
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
}


def _shape_bytes(shape_text: str) -> int:
    total = 0
    for m in _SHAPE_RE.finditer(shape_text):
        dt = m.group("dtype")
        nbytes = _DTYPE_BYTES.get(dt, 1 if dt.startswith("f8") else 4)
        n = 1
        dims = m.group("dims")
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * nbytes
    return total


def audit_collectives(hlo_text: str) -> Dict[str, Any]:
    """Parse optimized HLO text (``compiled.as_text()``) and tally every
    collective op: count and result-payload bytes per op kind, plus the
    largest single payload (the tensor to stare at if the audit fails)."""
    per_op = {op: {"count": 0, "bytes": 0} for op in _COLLECTIVE_OPS}
    largest = {"op": None, "bytes": 0, "line": ""}
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m or m.group("suffix") == "-done":
            continue
        op = m.group("op")
        nbytes = _shape_bytes(m.group("shape"))
        per_op[op]["count"] += 1
        per_op[op]["bytes"] += nbytes
        if nbytes > largest["bytes"]:
            largest = {"op": op, "bytes": nbytes, "line": line.strip()[:200]}
    total = sum(v["bytes"] for v in per_op.values())
    return {"per_op": per_op, "total_bytes": total, "largest": largest}


def param_bytes(tree) -> int:
    """Total bytes of all float leaves of a pytree (the model/grad size the
    all-reduce traffic should be proportional to)."""
    import jax
    import numpy as np

    tot = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and np.issubdtype(leaf.dtype, np.floating):
            tot += leaf.size * leaf.dtype.itemsize
    return tot


def audit_step(jitted_fn, *example_args) -> Dict[str, Any]:
    """Lower + compile a jitted function on example args and audit its
    collectives. Returns the ``audit_collectives`` dict."""
    compiled = jitted_fn.lower(*example_args).compile()
    return audit_collectives(compiled.as_text())

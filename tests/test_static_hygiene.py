"""Static source hygiene checks.

Module-level ``jnp.``/``jax.numpy`` array constants are banned package-wide:
on jax 0.9.0 a long-lived concrete jax array gets a cached trace-lifted tracer
the first time a jitted function captures it.  Every LATER trace that closes
over the same object captures the stale tracer instead, which makes pjit
separate ALL of that entry's constants into executable arguments — and the
C++ dispatch fast path then re-dispatches without supplying them, crashing
with ``Execution supplied 2 buffers but compiled program expected N``.
(Found via zstd compress_batch: the second shape entry's second call crashed
because lz4's module-level ``HASH_MULT = jnp.uint32(...)`` leaked a tracer.)

Module constants must be plain Python or numpy values; convert with
``jnp.asarray`` inside the traced function instead.
"""
import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "tpucomp"

# top-of-line assignment to a jnp./jax. expression (module scope, no indent)
_BANNED = re.compile(r"^[A-Za-z_][A-Za-z_0-9]*\s*=\s*(jnp|jax)\.", re.M)


def test_no_module_level_jax_arrays():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        for m in _BANNED.finditer(path.read_text()):
            line = m.group(0)
            # allow aliases of modules/functions (no call parentheses is fine,
            # e.g. ``shard_map = jax.shard_map``); ban calls that build arrays
            rest = path.read_text()[m.start():].splitlines()[0]
            if "(" in rest:
                offenders.append(f"{path.relative_to(PKG.parent)}: {rest.strip()}")
    assert not offenders, (
        "module-level jax array constants leak cached tracers across traces "
        "(jax 0.9.0) — use numpy here instead:\n" + "\n".join(offenders))

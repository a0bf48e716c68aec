"""Multi-process (DCN-analog) compressed all-gather.

The single-process 8-device CPU mesh cannot exercise the host boundary; this
test runs the same `shard_map` program across TWO `jax.distributed` processes
x 4 devices each (8 global devices), with cross-process CPU collectives via
gloo — the hermetic analog of the reference's multi-GPU-only test
(``benchmark_allgather.cpp:433-434``) plus the multi-host axis the reference
never had.
"""
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    from tpucomp.utils import honor_jax_platforms_env
    honor_jax_platforms_env()  # the axon sitecustomize overrides JAX_PLATFORMS
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    assert len(jax.devices()) == 8, jax.devices()
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tpucomp import parallel
    from tpucomp.chunk import ChunkBatch
    from tpucomp.utils import synth

    chunk = 2048
    data = synth.mixed_corpus(16 * chunk, seed=21).tobytes()
    cb = ChunkBatch.from_bytes(data, chunk_size=chunk)
    mesh = Mesh(np.array(jax.devices()), ("chunks",))
    fn = parallel.compressed_all_gather_fn("lz4", mesh, "chunks",
                                           cb.max_chunk_bytes)
    npd, nps = np.asarray(cb.data), np.asarray(cb.sizes)
    d = jax.make_array_from_callback(
        npd.shape, NamedSharding(mesh, P("chunks", None)),
        lambda idx: npd[idx])
    s = jax.make_array_from_callback(
        nps.shape, NamedSharding(mesh, P("chunks")), lambda idx: nps[idx])
    dec, dsz, csz, status = fn(d, s)
    from jax.experimental import multihost_utils
    dec_l = multihost_utils.process_allgather(dec)[:len(nps)] \\
        if dec.shape[0] != len(nps) else np.asarray(dec)
    assert int(np.asarray(status)) == 0
    got = b"".join(bytes(dec_l[i, : nps[i]]) for i in range(len(nps)))
    assert got == data, "multiprocess all-gather not bit-exact"
    comp_total = int(np.asarray(csz).sum())
    assert comp_total < len(data)
    print(f"proc {pid}: OK wire={comp_total} raw={len(data)}", flush=True)
""")


def test_two_process_compressed_all_gather(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # the worker script lives in tmp_path, so the repo root must be put on
    # sys.path explicitly (cwd alone is not added for script-by-path runs)
    repo = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, cwd=str(Path(__file__).parent.parent))
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multiprocess workers timed out")
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and ("gloo" in out.lower()
                                  and "unimplemented" in out.lower()):
            pytest.skip("CPU gloo collectives unavailable in this jaxlib")
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i}: OK" in out

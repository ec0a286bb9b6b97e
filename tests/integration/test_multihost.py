"""2-process multi-host init + sharded search (VERDICT r2 #7).

``engine/distributed.initialize_distributed`` had never executed with
more than one process.  This tier spawns two real OS processes, each with
4 virtual CPU devices, joins them through a local coordinator (Gloo
collectives stand in for DCN), and runs one sharded search step across
the 8-device global mesh — the cross-host analog of the single-process
8-device dryrun.
"""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(__file__)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_sharded_search():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    # The child runs as a script (sys.path[0] = tests/integration), so the
    # repo root must be on PYTHONPATH for ``import archi_tpu`` to resolve.
    repo_root = os.path.dirname(os.path.dirname(HERE))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mh_child.py"),
             str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(HERE)))
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MH_OK pid={pid}" in out, out
        # growth, cross-host tombstone+hybrid merge, and short-shard
        # k>per-shard fills all exercised cross-process (VERDICT r3 #9)
        assert "growth=ok" in out and "tombstone_hybrid=ok" in out
        assert "short_shards_k20=ok" in out

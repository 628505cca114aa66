"""Environment builder for CPU-only JAX subprocesses spawned from tests.

Two independent hangs lurk in a child process that inherits the test
host's environment:

- the TPU platform plugin (axon) initializes in any process that sees it
  on PYTHONPATH / PJRT vars, and its tunnel handshake can stall for
  minutes — scrub AXON*/PJRT_* and the axon site dir;
- TPU_* must be KEPT: jax's cloud_tpu_init consults TPU_LIBRARY_PATH
  first and only falls back to `import libtpu` without it — and that
  import hangs in this image; TPU_SKIP_MDS_QUERY=1 likewise suppresses a
  blocking metadata-server query during bare `import jax`.
"""
import os


def cpu_subprocess_env(**extra) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu", **extra)
    for k in list(env):
        if k.startswith(("AXON", "_AXON", "PJRT_")):
            del env[k]
    if "PYTHONPATH" in env:
        kept = [p for p in env["PYTHONPATH"].split(os.pathsep)
                if "axon" not in p]
        env["PYTHONPATH"] = os.pathsep.join(kept)
    env.setdefault("TPU_SKIP_MDS_QUERY", "1")
    return env

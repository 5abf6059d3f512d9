"""Persistent-compile-cache gating (deep_cartograph_tpu/__init__.py).

The persistent XLA cache pays for minutes-long remote TPU compiles, but
XLA:CPU AOT entries embed compile-option pseudo-features
(+prefer-no-scatter/-gather) that the loader flags against real host CPU
features on every load — noisy errors and a nominal SIGILL risk. Policy:
pure-CPU processes (JAX_PLATFORMS=cpu — tests, examples, the dryrun
child) skip the cache unless DEEP_CARTO_COMPILE_CACHE names a directory
explicitly.
"""

import os
import subprocess
import sys

_SNIPPET = (
    "import jax, deep_cartograph_tpu; "
    "print(repr(jax.config.jax_compilation_cache_dir))"
)


def _run(extra_env):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon sitecustomize override
    env.pop("DEEP_CARTO_COMPILE_CACHE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, "-c", _SNIPPET],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1]

def test_cpu_process_skips_persistent_cache():
    assert _run({}) == "None"


def test_explicit_cache_dir_wins_on_cpu(tmp_path):
    cache = str(tmp_path / "xla")
    assert _run({"DEEP_CARTO_COMPILE_CACHE": cache}) == repr(cache)


def test_explicit_zero_disables(tmp_path):
    assert _run({"DEEP_CARTO_COMPILE_CACHE": "0"}) == "None"

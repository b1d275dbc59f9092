"""Run a snippet in a fresh CPU-mesh python process.

jax 0.9's CPU backend intermittently SIGABRTs when donated collective
programs execute in a long-lived process that has run many other programs
(upstream bug, see conftest note). The multi-device train tests therefore
run in fresh interpreters.
"""

import os
import subprocess
import sys
import textwrap

_PRELUDE = textwrap.dedent(
    """
    import os
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    os.environ["CRT_DISABLE_FLASH"] = "1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    """
)


def run_in_subprocess(code: str, timeout: int = 280, attempts: int = 3) -> str:
    """Run code in a fresh interpreter; retry on collective-rendezvous
    starvation.  This CI host has ONE cpu core: 8 virtual XLA devices must
    timeslice through every collective, and XLA's fixed 40 s rendezvous
    timeout occasionally fires under load (fatal CHECK → SIGABRT).  On any
    multi-core machine this never triggers."""
    env = {
        k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))
    }
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    output = ""
    for attempt in range(attempts):
        proc = subprocess.run(
            [sys.executable, "-c", _PRELUDE + textwrap.dedent(code)],
            capture_output=True,
            timeout=timeout,
            cwd=repo_root,
            env=env,
        )
        output = proc.stdout.decode() + proc.stderr.decode()
        if proc.returncode == 0:
            return output
        starved = (
            "Termination timeout" in output
            or "rendezvous" in output.lower()
            or proc.returncode in (-6, 134)
        )
        if not starved or attempt == attempts - 1:
            break
    raise AssertionError(output[-3000:])

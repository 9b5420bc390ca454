"""fd-level stderr filter for known-noise XLA:CPU log lines.

XLA:CPU AOT executables record the *compiler's* feature list, which
always includes pseudo-features (+prefer-no-scatter, +prefer-no-gather)
that can never appear in a host's cpuid — so `cpu_aot_loader.cc` prints
a full machine-feature dump at ERROR severity for EVERY persistent-cache
load, even a same-machine one.  The lines are emitted by C++ directly on
fd 2, so Python-level sys.stderr redirection cannot catch them, and
TF_CPP_MIN_LOG_LEVEL is unreliable: jax's own ``__init__`` setdefaults
it to '1' the moment anything imports jax, which in pytest happens in
plugin loading *before* conftest runs (and suppressing at level 3 would
also hide genuine errors).

This filter splices a pipe onto fd 2 and drops only lines matching the
known-noise patterns; everything else passes through to the original
stderr unchanged.  Install once per process; it stays for the process
lifetime so late loads (lazily-compiled executables) are covered too.
"""

from __future__ import annotations

import os
import threading

_NOISE = (b"cpu_aot_loader.cc",)

_installed = False


def install_stderr_noise_filter() -> None:
    """Idempotently splice the noise filter onto fd 2."""
    global _installed
    if _installed:
        return
    _installed = True

    orig = os.dup(2)
    r, w = os.pipe()
    os.dup2(w, 2)
    os.close(w)

    def pump():
        buf = b""
        while True:
            try:
                chunk = os.read(r, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            out = b"".join(ln + b"\n" for ln in lines
                           if not any(p in ln for p in _NOISE))
            if out:
                try:
                    os.write(orig, out)
                except OSError:
                    break
        if buf and not any(p in buf for p in _NOISE):
            try:
                os.write(orig, buf)
            except OSError:
                pass

    t = threading.Thread(target=pump, name="stderr-noise-filter",
                         daemon=True)
    t.start()

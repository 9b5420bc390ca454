"""Subprocess compile probe: convert Mosaic compile hangs into fallbacks.

Round-3 war story: a 256-lane single-block Mosaic compile of the fused
var-ref kernel hung >30 min and once took the TPU worker down
(ops/variational.py `_PALLAS_VARREF_MAX_WIDTH`).  The shipped mitigation
was an empirical width gate — nothing would notice if a future shape hit
a new hang mode.  This module makes the gate *enforced*: the first time
a backend resolver wants to route a new shape onto a Pallas kernel, it
compiles that kernel in a SEPARATE subprocess with a wall-clock timeout
(the device_smoke.py isolation pattern).  A hang burns the timeout once,
is recorded, and the resolver falls back to the tiled/XLA path — the
main process never blocks and the verdict persists across runs.

Verdicts are cached in $FOT_CACHE_DIR/compile_probe.json keyed by a
caller-supplied string (shape + kernel + backend).  Set
FOT_COMPILE_GUARD=0 to disable probing (every verdict reads "ok") — the
escape hatch for environments where spawning a second TPU client is
undesirable.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_DEFAULT_TIMEOUT = 240.0
_mem_cache: dict[str, bool] = {}


def _registry_path() -> str:
    base = os.environ.get("FOT_CACHE_DIR", "/tmp/fot_jax_cache")
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, "compile_probe.json")


def _load() -> dict:
    try:
        with open(_registry_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _store(reg: dict) -> None:
    path = _registry_path()
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, "w") as f:
            json.dump(reg, f)
        os.replace(tmp, path)
    except OSError:
        pass


def enabled() -> bool:
    return os.environ.get("FOT_COMPILE_GUARD", "1") != "0"


def probe_ok(key: str, src: str,
             timeout: float = _DEFAULT_TIMEOUT) -> bool:
    """True iff ``src`` (a self-contained Python program that performs
    the compile) finishes successfully within ``timeout`` seconds.

    The verdict is cached (in-process and on disk), so a given shape is
    probed at most once per machine; a recorded hang/fail never blocks
    again.  With the guard disabled, always returns True.
    """
    if not enabled():
        return True
    if key in _mem_cache:
        return _mem_cache[key]
    reg = _load()
    if key in reg:
        _mem_cache[key] = reg[key] == "ok"
        return _mem_cache[key]

    verdict = "fail"
    try:
        proc = subprocess.run([sys.executable, "-c", src],
                              capture_output=True, text=True,
                              timeout=timeout)
        verdict = "ok" if proc.returncode == 0 else "fail"
        if verdict == "fail":
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-1:]
            print(f"# compile probe {key}: failed "
                  f"({tail[0][:120] if tail else 'no output'})",
                  file=sys.stderr)
    except subprocess.TimeoutExpired:
        verdict = "hang"
        print(f"# compile probe {key}: TIMEOUT after {timeout:.0f}s — "
              f"routing to fallback path", file=sys.stderr)

    reg = _load()
    reg[key] = verdict
    _store(reg)
    _mem_cache[key] = verdict == "ok"
    return _mem_cache[key]

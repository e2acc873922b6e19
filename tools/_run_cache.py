"""Persistent memoization of REFERENCE-side parity subprocesses.

The six protocol-parity tests each launch the reference's actual drivers
(tools/_ref_eval_wrapper.py) on deterministic seeded inputs.  The
reference tree is read-only and the inputs are seeded, so a probe's
stdout and written artifacts are a pure function of (command line,
relevant env, input file contents) — re-running them on every suite
invocation only re-pays the torch import + CPU forwards (~minutes per
run).  `cached_run` keys on exactly those and stores stdout + declared
output files under /tmp, so repeat suite runs skip the reference side
entirely (round-4 VERDICT task 5).

Scope guard: ONLY reference-side invocations may be cached — our own
CLIs change between commits and must always re-run.  Callers opt in per
invocation and declare the input/output files; anything undeclared is
not part of the key, so callers must list every file the driver reads
that the command line doesn't already pin.  ENDODAV_NO_PROBE_CACHE=1
disables caching (e.g. after editing the wrapper/shims, whose contents
are part of the key automatically).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys

CACHE_ROOT = os.environ.get(
    "ENDODAV_PROBE_CACHE_DIR", "/tmp/endodav_ref_probe_cache")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# wrapper + shims execute reference code; their content is always keyed
_HARNESS_FILES = (
    os.path.join(_REPO, "tools", "_ref_eval_wrapper.py"),
    os.path.join(_REPO, "tools", "_ref_train_probe.py"),
    os.path.join(_REPO, "tests", "refshim.py"),
)


def _file_digest(h: "hashlib._Hash", path: str) -> None:
    # directories hash their files under RELATIVE paths (a per-session
    # tempdir's random basename must not enter the key)
    if os.path.isdir(path):
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for f in sorted(files):
                p = os.path.join(root, f)
                h.update(os.path.relpath(p, path).encode())
                h.update(b"\0")
                with open(p, "rb") as fh:
                    for chunk in iter(lambda: fh.read(1 << 20), b""):
                        h.update(chunk)
        return
    h.update(os.path.basename(path).encode())
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)


def _key(cmd, env_keys, env, key_files) -> str:
    h = hashlib.sha256()
    # normalize tmp-path arguments out of the key: the CONTENT of every
    # path argument is keyed via key_files; the path strings themselves
    # change per pytest session
    for c in cmd:
        h.update((os.path.basename(c) if os.path.sep in c else c).encode())
        h.update(b"\0")
    for k in sorted(env_keys):
        h.update(f"{k}={os.path.basename(env.get(k, ''))}\0".encode())
    for p in list(key_files) + list(_HARNESS_FILES):
        if os.path.exists(p):
            _file_digest(h, p)
    return h.hexdigest()[:24]


def _snapshot(root: str) -> dict:
    out = {}
    for r, dirs, files in os.walk(root):
        dirs.sort()
        for f in files:
            p = os.path.join(r, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


def cached_run(cmd, env=None, key_files=(), capture_dir=None, env_keys=(),
               log=print):
    """subprocess.run with /tmp memoization.  Returns stdout.

    cmd/env: as subprocess.run (cwd is the repo root).
    key_files: files/dirs whose CONTENT the probe reads (inputs).
    capture_dir: directory whose new/changed files after the run ARE the
      probe's artifacts — stored relative, restored into the caller's
      (session-specific) capture_dir on a hit.
    env_keys: env var NAMES whose values affect behavior (path values are
      keyed by basename; their contents belong in key_files).
    """
    if os.environ.get("ENDODAV_NO_PROBE_CACHE"):
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=_REPO, env=env)
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
            raise RuntimeError(f"command failed ({r.returncode}): {cmd[:3]}...")
        return r.stdout
    key = _key(cmd, env_keys, env or {}, key_files)
    slot = os.path.join(CACHE_ROOT, key)
    meta = os.path.join(slot, "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            m = json.load(f)
        if capture_dir is not None:
            for rel in m.get("artifacts", []):
                dst = os.path.join(capture_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(os.path.join(slot, "art", rel), dst)
        log(f"[probe-cache] HIT {key} "
            f"({' '.join(os.path.basename(c) for c in cmd[1:3])})")
        return m["stdout"]
    before = _snapshot(capture_dir) if capture_dir is not None else {}
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=_REPO, env=env)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
        raise RuntimeError(f"command failed ({r.returncode}): {cmd[:3]}...")
    tmp = slot + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "art"), exist_ok=True)
    artifacts = []
    if capture_dir is not None:
        after = _snapshot(capture_dir)
        for rel, sig in after.items():
            if before.get(rel) != sig:
                dst = os.path.join(tmp, "art", rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(os.path.join(capture_dir, rel), dst)
                artifacts.append(rel)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"stdout": r.stdout, "artifacts": artifacts,
                   "cmd": [os.path.basename(c) for c in cmd]}, f)
    shutil.rmtree(slot, ignore_errors=True)
    try:
        os.replace(tmp, slot)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent writer won
    return r.stdout

"""Persistent TPU experiment runner (dev tool).

Starting a fresh Python process per experiment pays ~1-3 min of backend
init + compile, and the relay occasionally wedges on init.  This daemon
initializes JAX once and then watches /tmp/jobs/ for NNN.py files, execing
each in-process (globals persist across jobs, so arrays/compiled fns can be
reused) and writing NNN.out when done.

Usage:  python tools/jobd.py &            # once
        cp exp.py /tmp/jobs/001.py        # submit
        cat /tmp/jobs/001.out             # result (last line DONE/FAIL)
"""

import io
import os
import sys
import time
import traceback

JOBS = "/tmp/jobs"
os.makedirs(JOBS, exist_ok=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

print("jobd: devices", jax.devices(), flush=True)

G = {"__name__": "__jobd__"}
seen = set()
while True:
    for name in sorted(os.listdir(JOBS)):
        if not name.endswith(".py") or name in seen:
            continue
        seen.add(name)
        path = os.path.join(JOBS, name)
        out_path = path[:-3] + ".out"
        buf = io.StringIO()
        t0 = time.time()
        status = "DONE"
        old = sys.stdout
        sys.stdout = buf
        try:
            with open(path) as f:
                code = f.read()
            exec(compile(code, path, "exec"), G)
        except Exception:
            traceback.print_exc(file=buf)
            status = "FAIL"
        finally:
            sys.stdout = old
        with open(out_path, "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n[{status} {time.time() - t0:.1f}s]\n")
        print(f"jobd: {name} {status} {time.time() - t0:.1f}s", flush=True)
    time.sleep(0.5)

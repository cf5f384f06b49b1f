"""Persistent TPU bench worker: execs /tmp/job.py whenever it appears,
appends output to /tmp/worker.log, keeps the warmed axon session alive."""
import os, sys, time, traceback
import jax, jax.numpy as jnp, numpy as np

def log(msg):
    with open("/tmp/worker.log", "a") as fh:
        fh.write(msg + "\n")

t0 = time.perf_counter()
float(jnp.ones((8, 8)).sum())
log(f"WORKER READY (warm {time.perf_counter()-t0:.0f}s)")

G = {"jax": jax, "jnp": jnp, "np": np, "time": time, "log": log}
while True:
    if os.path.exists("/tmp/job.py"):
        src = open("/tmp/job.py").read()
        os.remove("/tmp/job.py")
        log(f"--- JOB start {time.strftime('%H:%M:%S')} ---")
        try:
            exec(src, G)
        except Exception:
            log(traceback.format_exc())
        log("--- JOB done ---")
    time.sleep(2)

"""Verify the hostio fix: full solver wrappers should now cost ~1 RPC each.

Before (probe9): gmres wrapper ~135 ms (zeros_like put + tol put + 2 fetches)
while the device solve itself is <0.1 ms.  After: one cached tol put at
warmup + one batched device_get per call.
"""
import sys, time
sys.path.insert(0, ".")


def main():
    import numpy as np
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import cgmres, gmres

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    cons = s.constraints()
    k = 30

    def med(fn, reps=7):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t = med(lambda: gmres(A, b, k=k, tol=1e-50)[0].block_until_ready())
    print(f"gmres wrapper      {t*1e3:9.2f} ms   (was ~135)", flush=True)
    t = med(lambda: cgmres(A, b, k=k, tol=1e-7, constraints=cons)[0]
            .block_until_ready())
    print(f"cgmres wrapper     {t*1e3:9.2f} ms   (was ~259/507)", flush=True)
    t = med(lambda: gmres(A, b, k=k, tol=1e-50, true_residual=False)[0]
            .block_until_ready())
    print(f"gmres est wrapper  {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

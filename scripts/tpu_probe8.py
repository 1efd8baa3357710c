"""Minimal: gmres while vs fori (fast) in one window."""
import sys, time
sys.path.insert(0, ".")

def main():
    import numpy as np
    from structurepreservingiterativesolvers_tpu.models import heat
    from structurepreservingiterativesolvers_tpu.solvers import gmres

    s = heat.linforms(M=256)
    A, b = s.A, s.b
    k = 30

    def med(fn, reps=7):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t = med(lambda: gmres(A, b, k=k, tol=1e-50)[0].block_until_ready())
    print(f"gmres full(while) {t*1e3:9.2f} ms", flush=True)
    t = med(lambda: gmres(A, b, k=k, tol=1e-50, loop="fori", true_residual=False)[0].block_until_ready())
    print(f"gmres est(fori)   {t*1e3:9.2f} ms", flush=True)

if __name__ == "__main__":
    main()

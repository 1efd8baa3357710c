"""Continue the Mosaic bisect: 3-D data BlockSpec + the real DIA kernel,
each in a SUBPROCESS (the failure may be a hard crash, not an exception)."""
import subprocess
import sys

CASES = {
    "3d data blockspec": r"""
import warnings; warnings.filterwarnings("ignore")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
LANES, Rb, D, grid_n = 128, 8, 7, 5
data3 = jnp.asarray(np.random.default_rng(0).standard_normal((D, grid_n*Rb, LANES)), jnp.float32)
x = jnp.asarray(np.random.default_rng(1).standard_normal((grid_n*Rb, LANES)), jnp.float32)
def kern(d_ref, x_ref, y_ref):
    acc = d_ref[0] * x_ref[:]
    for d in range(1, D):
        acc = acc + d_ref[d] * x_ref[:]
    y_ref[:] = acc
y = pl.pallas_call(kern, grid=(grid_n,),
    in_specs=[pl.BlockSpec((D, Rb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((Rb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((Rb, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((grid_n*Rb, LANES), jnp.float32))(data3, x)
y.block_until_ready(); print("OK")
""",
    "real dia kernel M=64": r"""
import warnings; warnings.filterwarnings("ignore")
import sys; sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from structurepreservingiterativesolvers_tpu.models import heat
from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import dia_spmv_pallas
s = heat.linforms(M=64, dtype=jnp.float32)
A = s.A
x = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]), jnp.float32)
y = dia_spmv_pallas(A, x, block_rows=1024)
err = float(jnp.abs(y - A @ x).max())
print("OK err", err)
""",
    "real dia kernel M=1024 R=16384": r"""
import warnings; warnings.filterwarnings("ignore")
import sys; sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from structurepreservingiterativesolvers_tpu.models import heat
from structurepreservingiterativesolvers_tpu.ops.pallas_spmv import dia_spmv_pallas
s = heat.linforms(M=1024)
A = s.A
x = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]), s.b.dtype)
y = dia_spmv_pallas(A, x, block_rows=16384)
err = float(jnp.abs(y - A @ x).max())
print("OK err", err)
""",
}


def main():
    for name, code in CASES.items():
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=300)
        out = (r.stdout or "").strip().splitlines()
        ok = out[-1] if out else ""
        if r.returncode == 0 and ok.startswith("OK"):
            print(f"{name:32s} {ok}", flush=True)
        else:
            err_lines = [l for l in (r.stderr or "").splitlines()
                         if l.strip()][-6:]
            print(f"{name:32s} FAIL rc={r.returncode}", flush=True)
            for l in err_lines:
                print(f"    {l[:180]}", flush=True)


if __name__ == "__main__":
    main()

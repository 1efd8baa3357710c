"""Regenerate the committed reference-parameter fixtures (fixtures/*.npz).

Run ONLY when an assembly change is intentional — tests/test_fixtures.py
pins the current assets bit-for-bit against live assembly.
"""

import sys

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from structurepreservingiterativesolvers_tpu.models import (
        heat,
        lkdv,
        lkdvrk,
        swe,
    )
    from structurepreservingiterativesolvers_tpu.models.fixtures import (
        save_fixture,
    )

    specs = [
        ("lkdv", lkdv, dict(M=50, degree=1), "fixtures/lkdv_M50_deg1.npz"),
        ("lkdvrk", lkdvrk, dict(M=50, degree=3, tstages=2),
         "fixtures/lkdvrk_M50_deg3_s2.npz"),
        ("heat", heat, dict(M=16, degree=1), "fixtures/heat_M16_deg1.npz"),
        ("swe", swe, dict(M=16, degree=1), "fixtures/swe_M16_deg1.npz"),
    ]
    for name, mod, kw, path in specs:
        s = mod.linforms(**kw)
        save_fixture(path, s, name)
        print(f"{name}: wrote {path}")


if __name__ == "__main__":
    main()

"""Sharding cost evidence table (VERDICT r3 item 3) — compiled-cost
accounting (parallel/costs.py) for the sharded inference paths at
production shapes, printed as the PERF.md markdown table.

Runs on the virtual CPU mesh (compile-only; nothing executes):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  PYTHONPATH=/root/repo python scripts/sharding_cost_report.py

The assertions behind these numbers live in tests/test_sharding_costs.py.
"""
import functools
import os

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from mivos_tpu.parallel.costs import collective_bytes, compiled_flops
from mivos_tpu.parallel.mesh import make_mesh


def mb(x):
    return f"{x / 1e6:.2f} MB"


def bank_read_row(d=8, k=3, n=1620, ck=128, cv=512, top_k=50):
    """Production 480p read: N = (480/16)*(864/16) = 1620 queries."""
    from mivos_tpu.parallel.sharded_memory import sharded_memory_read

    mesh = make_mesh(d)
    rows = []
    for m in (20480, 40960):
        fn = functools.partial(sharded_memory_read, mesh, top_k=top_k)
        c = jax.jit(fn).lower(
            jax.ShapeDtypeStruct((k, m, ck), jnp.float32),
            jax.ShapeDtypeStruct((k, m, cv), jnp.float32),
            jax.ShapeDtypeStruct((n, ck), jnp.float32),
            valid=jax.ShapeDtypeStruct((m,), jnp.bool_)).compile()
        b = collective_bytes(c)
        rows.append((m, compiled_flops(c), b.get("all-gather", 0),
                     b.get("all-reduce", 0)))
    bank_bytes = k * 20480 * (ck + cv) * 4
    print("\n| bank-sharded read (D=8, K=3, N=1620, top-k 50) | per-device "
          "GFLOP | all-gather | all-reduce |")
    print("|---|---|---|---|")
    for m, f, ag, ar in rows:
        print(f"| M={m} | {f / 1e9:.1f} | {mb(ag)} | {mb(ar)} |")
    print(f"| (fp32 bank at M=20480 for scale: {mb(bank_bytes)}; the "
          f"collectives above do not grow with M) |")
    assert rows[0][2:] == rows[1][2:], rows


def step_fn(prop):
    from mivos_tpu.ops.aggregate import aggregate_wbg

    def step(params, mem_k, mem_v, valid, image):
        f16, f8, f4, k16, v16 = prop.apply(
            params, image, method="get_query_values")
        out = prop.apply(params, mem_k, mem_v, valid, f16, f8, f4,
                         k16, v16, method="segment_with_query")
        agg = aggregate_wbg(out, keep_bg=True)
        mk, mv = prop.apply(params, image, agg[1:], method="memorize")
        return agg, mk, mv

    return step


def object_step_rows():
    from mivos_tpu.models.propagation import PropagationNetwork

    print("\n| object-sharded per-frame step (480p padded 480x864, 2-frame "
          "bank) | FLOP/device vs 1 chip | obj-parallel fraction p | "
          "cross-object collectives |")
    print("|---|---|---|---|")
    for k, d in ((3, 3), (8, 8)):
        h, w = 480, 864
        mesh = make_mesh(d, axis="object")
        base = PropagationNetwork(top_k=50, read_backend="xla_exact")
        sharded = PropagationNetwork(top_k=50, read_backend="xla_exact",
                                     object_mesh=mesh,
                                     object_axis="object")
        params = jax.eval_shape(
            lambda net=base: net.init(
                jax.random.PRNGKey(0), jnp.zeros((h, w, 3)),
                jnp.zeros((k, h, w, 1)), jnp.zeros((h, w, 3))))
        m = 2 * (h // 16) * (w // 16)

        def compile_step(prop):
            return jax.jit(step_fn(prop)).lower(
                params,
                jax.ShapeDtypeStruct((k, m, 128), jnp.float32),
                jax.ShapeDtypeStruct((k, m, 512), jnp.float32),
                jax.ShapeDtypeStruct((m,), jnp.bool_),
                jax.ShapeDtypeStruct((h, w, 3), jnp.float32)).compile()

        f1 = compiled_flops(compile_step(base))
        c = compile_step(sharded)
        fd = compiled_flops(c)
        coll = sum(collective_bytes(c).values())
        p = (1.0 - fd / f1) / (1.0 - 1.0 / d)
        print(f"| K={k} over {d} chips | {fd / f1:.2f}x "
              f"({f1 / fd:.1f}x reduction) | {p:.2f} | {mb(coll)} |")


if __name__ == "__main__":
    print("devices:", len(jax.devices()))
    bank_read_row()
    object_step_rows()
    print("\nSHARDING-COST-REPORT-OK")

"""On-device bounded L-BFGS.

Replaces the reference's scipy fmin_l_bfgs_b driving torch
forward/backward through a host callback (fbrs/inference/predictors/
brs.py:107, brs_functors.py:41-77) — a host<->device ping-pong per
function evaluation. Here the entire optimization (L-BFGS direction via
optax, zoom linesearch, best-iterate tracking, and the reference's
early-exit rules) runs inside ONE jitted lax.while_loop on device.

Bounded trip count (maxiter, reference lbfgs_params maxfun=20) makes the
loop jit-stable; early exits turn remaining iterations into no-ops.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def lbfgs_minimize(
    fun: Callable,                       # x -> (loss, aux)
    x0: jax.Array,
    maxiter: int = 20,
    memory_size: int = 20,
    gtol: float = 1e-8,
    stop_fn: Optional[Callable] = None,  # (aux, stop_state) -> (stop, state)
    stop_state0=None,
):
    """Minimize fun over a flat vector x. Returns (best_x, info dict).

    `fun` must return (scalar_loss, aux). `stop_fn` implements
    domain-specific early exits (e.g. the f-BRS clicks-satisfied /
    IoU-converged rules) from the per-iteration aux.
    """
    opt = optax.lbfgs(memory_size=memory_size)

    def scalar_fun(x):
        return fun(x)[0]

    vg = jax.value_and_grad(fun, has_aux=True)

    (l0, aux0), g0 = vg(x0)
    carry0 = {
        "x": x0,
        "state": opt.init(x0),
        "best_x": x0,
        "best_loss": l0,
        "stop_state": stop_state0,
        "done": jnp.asarray(False),
        "it": jnp.asarray(0, jnp.int32),
    }

    def cond(c):
        return jnp.logical_and(~c["done"], c["it"] < maxiter)

    def body(c):
        (loss, aux), grad = vg(c["x"])
        better = loss < c["best_loss"]
        best_x = jnp.where(better, c["x"], c["best_x"])
        best_loss = jnp.where(better, loss, c["best_loss"])

        done = jnp.max(jnp.abs(grad)) < gtol
        stop_state = c["stop_state"]
        if stop_fn is not None:
            stop, stop_state = stop_fn(aux, stop_state)
            done = jnp.logical_or(done, stop)

        updates, state = opt.update(grad, c["state"], c["x"], value=loss,
                                    grad=grad, value_fn=scalar_fun)
        x = optax.apply_updates(c["x"], updates)
        return {"x": x, "state": state, "best_x": best_x,
                "best_loss": best_loss, "stop_state": stop_state,
                "done": done, "it": c["it"] + 1}

    out = jax.lax.while_loop(cond, body, carry0)
    # Final iterate may beat the best tracked one.
    final_loss = scalar_fun(out["x"])
    better = final_loss < out["best_loss"]
    best_x = jnp.where(better, out["x"], out["best_x"])
    best_loss = jnp.where(better, final_loss, out["best_loss"])
    return best_x, {"loss": best_loss, "iters": out["it"]}

"""Unicycle kinematics (forward Euler), as in the reference NLP dynamics
``src/obca.py:902-905``: state z = [x, y, theta], input u = [v, w].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unicycle_step(state, u, dt):
    """One forward-Euler step. state: (..., 3), u: (..., 2), dt scalar."""
    x, y, th = state[..., 0], state[..., 1], state[..., 2]
    v, w = u[..., 0], u[..., 1]
    return jnp.stack(
        [x + dt * v * jnp.cos(th), y + dt * v * jnp.sin(th), th + dt * w],
        axis=-1,
    )


def unicycle_rollout(x0, us, dt):
    """Roll out a control sequence. x0: (3,), us: (N, 2) -> (N+1, 3)."""

    def body(state, u):
        nxt = unicycle_step(state, u, dt)
        return nxt, nxt

    _, xs = jax.lax.scan(body, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)

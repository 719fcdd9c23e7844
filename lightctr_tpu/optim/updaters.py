"""Optimizer suite — optax-compatible GradientTransformations.

Covers the reference's updater set (capability parity with
``util/gradientUpdater.h`` and ``util/momentumUpdater.h``):

  sgd / momentum     <- SimpleUpdater           (gradientUpdater.h:68-86)
  adagrad            <- AdagradUpdater(_Num)    (gradientUpdater.h:88-155)
  rmsprop            <- RMSpropUpdater(_Num)    (gradientUpdater.h:156-233)
  ftrl               <- FTRLUpdater             (gradientUpdater.h:235-278)
  adadelta           <- AdadeltaUpdater(_Num)   (momentumUpdater.h:20-111)
  adam               <- AdamUpdater(_Num)       (momentumUpdater.h:113-215)
  dcasgd             <- ParamServer DCASGD      (paramserver.h:252-287)
  clip_by_value      <- grad clip +-15          (fullyconnLayer.h:41,129)
  add_decayed_l2     <- __global_lambdaL2       (main.cpp:69)

All are standard published formulas re-derived here; each transform is a
pure (init, update) pair so they compose with `optax.chain` and run under
jit/pjit with the state sharded like the params (crucial for the sharded
embedding tables, where optimizer state co-locates with table shards —
the TPU replacement of the reference's server-side updates).

FTRL keeps (z, n) state and produces *delta* updates so it still fits the
additive `apply_updates` contract: update = w_new(z,n) - w_old.
"""

from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp

try:  # optax is available in the image; fall back to a local minimal pair.
    import optax

    GradientTransformation = optax.GradientTransformation
    EmptyState = optax.EmptyState
    chain = optax.chain
    apply_updates = optax.apply_updates
except Exception:  # pragma: no cover

    class GradientTransformation(NamedTuple):
        init: Any
        update: Any

    class EmptyState(NamedTuple):
        pass

    def chain(*transforms):
        def init(params):
            return tuple(t.init(params) for t in transforms)

        def update(updates, state, params=None):
            new_state = []
            for t, s in zip(transforms, state):
                updates, s = t.update(updates, s, params)
                new_state.append(s)
            return updates, tuple(new_state)

        return GradientTransformation(init, update)

    def apply_updates(params, updates):
        return jax.tree_util.tree_map(lambda p, u: p + u, params, updates)


def _zeros_like_tree(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


# ---------------------------------------------------------------------------
# Plain SGD / momentum


def sgd(learning_rate: float) -> GradientTransformation:
    def init(params):
        return EmptyState()

    def update(updates, state, params=None):
        return jax.tree_util.tree_map(lambda g: -learning_rate * g, updates), state

    return GradientTransformation(init, update)


class MomentumState(NamedTuple):
    velocity: Any


def momentum(learning_rate: float, beta: float = 0.9, nesterov: bool = False) -> GradientTransformation:
    def init(params):
        return MomentumState(velocity=_zeros_like_tree(params))

    def update(updates, state, params=None):
        v = jax.tree_util.tree_map(lambda vv, g: beta * vv + g, state.velocity, updates)
        if nesterov:
            out = jax.tree_util.tree_map(lambda vv, g: -learning_rate * (beta * vv + g), v, updates)
        else:
            out = jax.tree_util.tree_map(lambda vv: -learning_rate * vv, v)
        return out, MomentumState(velocity=v)

    return GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Adagrad


class AdagradState(NamedTuple):
    accum: Any


def adagrad(learning_rate: float, eps: float = 1e-7, initial_accumulator: float = 0.0) -> GradientTransformation:
    """w -= lr * g / (sqrt(sum g^2) + eps) — AdagradUpdater_Num semantics."""

    def init(params):
        return AdagradState(
            accum=jax.tree_util.tree_map(lambda p: jnp.full_like(p, initial_accumulator), params)
        )

    def update(updates, state, params=None):
        accum = jax.tree_util.tree_map(lambda a, g: a + g * g, state.accum, updates)
        out = jax.tree_util.tree_map(
            lambda g, a: -learning_rate * g / (jnp.sqrt(a) + eps), updates, accum
        )
        return out, AdagradState(accum=accum)

    return GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# RMSprop


class RMSpropState(NamedTuple):
    nu: Any


def rmsprop(learning_rate: float, decay: float = 0.9, eps: float = 1e-7) -> GradientTransformation:
    def init(params):
        return RMSpropState(nu=_zeros_like_tree(params))

    def update(updates, state, params=None):
        nu = jax.tree_util.tree_map(lambda n, g: decay * n + (1 - decay) * g * g, state.nu, updates)
        out = jax.tree_util.tree_map(
            lambda g, n: -learning_rate * g / (jnp.sqrt(n) + eps), updates, nu
        )
        return out, RMSpropState(nu=nu)

    return GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Adadelta


class AdadeltaState(NamedTuple):
    accum_grad: Any
    accum_update: Any


def adadelta(rho: float = 0.95, eps: float = 1e-6, learning_rate: float = 1.0) -> GradientTransformation:
    def init(params):
        return AdadeltaState(
            accum_grad=_zeros_like_tree(params), accum_update=_zeros_like_tree(params)
        )

    def update(updates, state, params=None):
        eg = jax.tree_util.tree_map(
            lambda a, g: rho * a + (1 - rho) * g * g, state.accum_grad, updates
        )
        delta = jax.tree_util.tree_map(
            lambda g, a, u: -g * jnp.sqrt(u + eps) / jnp.sqrt(a + eps),
            updates,
            eg,
            state.accum_update,
        )
        eu = jax.tree_util.tree_map(
            lambda u, d: rho * u + (1 - rho) * d * d, state.accum_update, delta
        )
        out = jax.tree_util.tree_map(lambda d: learning_rate * d, delta)
        return out, AdadeltaState(accum_grad=eg, accum_update=eu)

    return GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Adam


class AdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> GradientTransformation:
    def init(params):
        return AdamState(
            count=jnp.zeros((), jnp.int32),
            mu=_zeros_like_tree(params),
            nu=_zeros_like_tree(params),
        )

    def update(updates, state, params=None):
        count = state.count + 1
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(lambda n, g: b2 * n + (1 - b2) * g * g, state.nu, updates)
        c1 = 1.0 - jnp.power(jnp.float32(b1), count.astype(jnp.float32))
        c2 = 1.0 - jnp.power(jnp.float32(b2), count.astype(jnp.float32))
        out = jax.tree_util.tree_map(
            lambda m, n: -learning_rate * (m / c1) / (jnp.sqrt(n / c2) + eps), mu, nu
        )
        return out, AdamState(count=count, mu=mu, nu=nu)

    return GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# FTRL-proximal (online LR) — the workhorse for the sparse wide part.


class FTRLState(NamedTuple):
    z: Any
    n: Any


def ftrl(
    alpha: float = 0.15,
    beta: float = 1.0,
    lambda1: float = 1.0,
    lambda2: float = 1.0,
) -> GradientTransformation:
    """FTRL-proximal with L1/L2; defaults match the reference's constants
    (``gradientUpdater.h:240-243``). Emits delta = w_new - w_old."""

    def init(params):
        return FTRLState(z=_zeros_like_tree(params), n=_zeros_like_tree(params))

    def update(updates, state, params=None):
        assert params is not None, "ftrl requires params"

        def upd(g, z, n, w):
            n_new = n + g * g
            sigma = (jnp.sqrt(n_new) - jnp.sqrt(n)) / alpha
            z_new = z + g - sigma * w
            w_new = jnp.where(
                jnp.abs(z_new) <= lambda1,
                jnp.zeros_like(w),
                -(z_new - jnp.sign(z_new) * lambda1)
                / ((beta + jnp.sqrt(n_new)) / alpha + lambda2),
            )
            return w_new - w, z_new, n_new

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_z = treedef.flatten_up_to(state.z)
        flat_n = treedef.flatten_up_to(state.n)
        flat_w = treedef.flatten_up_to(params)
        outs = [upd(g, z, n, w) for g, z, n, w in zip(flat_g, flat_z, flat_n, flat_w)]
        deltas = treedef.unflatten([o[0] for o in outs])
        z_new = treedef.unflatten([o[1] for o in outs])
        n_new = treedef.unflatten([o[2] for o in outs])
        return deltas, FTRLState(z=z_new, n=n_new)

    return GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# DCASGD — delay-compensated async SGD (capability parity with the PS's
# server-side updater; in the synchronous TPU regime the compensation term
# is available for DCN-staged updates where the applied weight may lag).


class DCASGDState(NamedTuple):
    shadow: Any


def dcasgd(learning_rate: float, variance: float = 2.0) -> GradientTransformation:
    def init(params):
        return DCASGDState(shadow=jax.tree_util.tree_map(jnp.array, params))

    def update(updates, state, params=None):
        assert params is not None, "dcasgd requires params"
        out = jax.tree_util.tree_map(
            lambda g, w, s: -learning_rate * (g + variance * g * g * (w - s)),
            updates,
            params,
            state.shadow,
        )
        shadow = jax.tree_util.tree_map(lambda w, d: w + d, params, out)
        return out, DCASGDState(shadow=shadow)

    return GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Gradient clipping + decoupled L2 (weights into grads), reference-style.


def clip_by_value(limit: float = 15.0) -> GradientTransformation:
    def init(params):
        return EmptyState()

    def update(updates, state, params=None):
        return (
            jax.tree_util.tree_map(lambda g: jnp.clip(g, -limit, limit), updates),
            state,
        )

    return GradientTransformation(init, update)


def add_decayed_l2(lambda2: float) -> GradientTransformation:
    def init(params):
        return EmptyState()

    def update(updates, state, params=None):
        assert params is not None
        return (
            jax.tree_util.tree_map(lambda g, w: g + lambda2 * w, updates, params),
            state,
        )

    return GradientTransformation(init, update)

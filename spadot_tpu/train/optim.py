"""AdamW with reduced-precision (bfloat16) optimizer-state storage.

Why: the mouse-scale per-op profile (docs/tpu_logs/profile_mouse_series.log)
shows the gene-dim optimizer update is HBM-roofline — the (9281, 2048)
encoder weight alone streams 76 MB of f32 params + 2×76 MB f32 moments
per step × 21 steps/epoch ≈ 11.9 ms/ep at mouse scale. Storing Adam's m/v
in bfloat16 halves the moment traffic (and the checkpoint size).

Numerics: the MATH stays float32 — each step decodes m/v to f32, applies
the standard Adam recurrences and bias correction, and re-encodes the new
moments to bf16 storage. Only the storage rounds: bf16's 8-bit mantissa
gives ~0.4% relative error on v, ~0.2% on the 1/sqrt(v) step scale, and
m's round error is zero-mean across steps. THE SHIPPED DEFAULT since
2026-08-20 (config.yaml: optimizer_state_dtype): bench −3.4% CH / −3.5%
mouse, finite through the rescue-firing collapsed-dim scenario, 5-seed
ARI gate green (paired delta +0.0004±0.0064,
docs/tpu_logs/quality_optbf16_5seed.log). The parity preset pins
float32 (reference-equivalent optimizer states).

Reference anchor: the reference's whole optimizer is torch AdamW at
SpaDOT/utils/_train_utils.py:158 (f32 states, no knob) — this is TPU-side
headroom it cannot express.
"""
import jax
import jax.numpy as jnp
import optax


def scale_by_adam_bf16_state(b1=0.9, b2=0.999, eps=1e-8):
    """optax.scale_by_adam with m/v STORED in bfloat16 (f32 math)."""

    def init_fn(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), jnp.bfloat16)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c

        def moments(g, m, v):
            g = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g * g
            step = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            return step, m32.astype(jnp.bfloat16), v32.astype(jnp.bfloat16)

        out = jax.tree_util.tree_map(moments, updates, state.mu, state.nu)
        steps = jax.tree_util.tree_map(lambda t: t[0], out,
                                       is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree_util.tree_map(lambda t: t[1], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree_util.tree_map(lambda t: t[2], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        return steps, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw(lr, weight_decay=0.01, state_dtype="float32"):
    """optax.adamw, or the bf16-state variant when state_dtype says so —
    same chain composition (scale_by_adam → add_decayed_weights →
    scale(-lr)) so the opt_state pytree structure (and therefore the
    checkpoint path layout, train/checkpoint.py) is identical."""
    if str(state_dtype).lower() in ("bfloat16", "bf16"):
        return optax.chain(
            scale_by_adam_bf16_state(),
            optax.add_decayed_weights(weight_decay),
            optax.scale(-float(lr)),
        )
    return optax.adamw(float(lr), weight_decay=weight_decay)

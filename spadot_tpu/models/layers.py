"""Neural modules: SVGP-branch encoder MLP, GAT encoder, shared decoder.

Architecture parity with the reference (layer sizes/normalization/activation):
- SVGPEncoder: Linear+BatchNorm1d+LeakyReLU stack then fc -> (mu, exp(logvar)),
  SpaDOT/model/encoder.py:7-34.
- GATEncoder: 3 GAT layers (hidden 512, 4 heads; concat on the first two,
  head-mean on the third) then fc, SpaDOT/model/encoder.py:37-61.
- Decoder: Linear+LayerNorm+LeakyReLU stack with a plain final Linear,
  SpaDOT/model/decoder.py:3-20.

Xavier-uniform kernel init everywhere, matching encoder.py:15,23,42-48.
BatchNorm supports a row mask so padded batch rows never pollute statistics.
"""
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from spadot_tpu.ops.gat import (
    gat_attention, gat_attention_banded, gat_attention_dense,
)
from spadot_tpu.ops.gat_flash import (
    FLASH2_MAX_N, FLASH3_MAX_N, TILE3_I, banded_flash_eligible,
    flash1_gat_supported, flash2_gat_supported, flash2_tile,
    flash3_gat_supported, flash3b_batched_gat_supported,
    flash3b_gat_supported, flash_dense_max_n,
    gat_attention_banded_flash, gat_attention_banded_flash_batched,
    gat_attention_dense_flash, gat_attention_dense_flash2,
    gat_attention_dense_flash3,
)

_XAVIER = nn.initializers.xavier_uniform()


class SVGPEncoder(nn.Module):
    hidden_dims: Sequence[int]
    z_dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, mask=None):
        kw = dict(kernel_init=_XAVIER, param_dtype=self.param_dtype,
                  dtype=self.param_dtype)
        bn_mask = None if mask is None else mask[:, None].astype(bool)
        for width in self.hidden_dims:
            x = nn.Dense(width, **kw)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                param_dtype=self.param_dtype, dtype=self.param_dtype,
            )(x, mask=bn_mask)
            x = nn.leaky_relu(x, 0.01)
        z = nn.Dense(self.z_dim * 2, **kw)(x)
        mu, logvar = jnp.split(z, 2, axis=1)
        # clamp keeps exp() finite in float32 (the reference trains float64,
        # where exp saturates at 709 instead of 88; behavior unchanged within
        # any sane variance range)
        return mu, jnp.exp(jnp.clip(logvar, -15.0, 15.0))


class GATLayer(nn.Module):
    """One GAT layer with a size-gated execution policy.

    All shapes are static under jit, so the path is chosen at trace time from
    the row count n (measured on TPU v5e, 4 heads x 512 features, fwd+bwd per
    layer — docs/performance.md "GAT path selection"):

      - adj provided (dense gates in data/pipeline.py + the windowed branch):
          n_pad <= ~2.5k : fused flash kernel (VMEM-resident softmax,
                           2.29 ms at 2500 vs 2.9 XLA dense);
          512-aligned,
          n_pad <= 16384 : head-fused tiled kernel (flash3: all heads per
                           grid step, tall 512-row i tiles under a raised
                           VMEM limit, single fused backward — 9.9 ms at
                           7680 / 11.7 at 8192 vs 18.1 / 18.4 XLA dense);
          n_pad <= 5120  : tiled FA2-style kernel (flash2 — flash3's
                           fallback if its probe fails; 4.4 ms at 4000);
          beyond         : XLA dense-adjacency attention (batched MXU
                           matmuls — also the non-512-aligned fallback);
      - no adj, n >= pallas_min_n: windowed Pallas gather aggregation + XLA
        scatter backward (38.4 ms at n=8704 vs 51.8 XLA-autodiff);
      - no adj, n <= rev_max_n: XLA scan + scatter-free reverse-list
        backward; in between: XLA scan + plain autodiff.

    rev_mode: "auto" (the gate above), "force" (reverse-list backward
    whenever lists are provided), "off" (never).
    """

    out_features: int
    heads: int
    concat: bool = True
    use_pallas: bool = False
    param_dtype: Any = jnp.float32
    rev_mode: str = "auto"
    pallas_min_n: int = 4500
    rev_max_n: int = 3500

    @nn.compact
    def __call__(self, h, nbr, nbr_mask, rev=None, adj=None):
        F_in = h.shape[-1]
        n = h.shape[0]
        H, F = self.heads, self.out_features
        W = self.param("W", _XAVIER, (F_in, H * F), self.param_dtype)
        att_src = self.param("att_src", _XAVIER, (H, F), self.param_dtype)
        att_dst = self.param("att_dst", _XAVIER, (H, F), self.param_dtype)
        bias_shape = (H * F,) if self.concat else (F,)
        bias = self.param("bias", nn.initializers.zeros, bias_shape, self.param_dtype)
        if adj is not None and adj.ndim == 4:
            # nb-batched banded closure adjacencies (nb, ni, TI, Wb) with
            # h (nb, P, F_in) — the closure-batched extraction path
            # (models/model.py:full_latent_ext): ONE fused kernel launch
            # across the closure batch (ops/gat_flash.py flash3bb). The
            # fallback vmaps the XLA banded path (CPU tests, failed probe).
            if (
                self.use_pallas and F % 128 == 0
                and banded_flash_eligible(adj.shape[1:])
                and flash3b_batched_gat_supported(
                    TI=adj.shape[2], Wb=adj.shape[3], F=F, H=H
                )
            ):
                return gat_attention_banded_flash_batched(
                    h, adj, W, att_src, att_dst, bias, concat=self.concat
                )
            return jax.vmap(
                lambda hb, ab: gat_attention_banded(
                    hb, ab, W, att_src, att_dst, bias, concat=self.concat
                )
            )(h, adj)
        if adj is not None and adj.ndim == 3:
            # banded closure adjacency (ni, TI, Wb) — RCM-reordered strips,
            # exact at ~P/Wb times less work than any dense-square path.
            # Fused kernel when the layout allows (no HBM strip views,
            # Wb/P x less wx streaming than flash3); XLA banded otherwise
            # (ops/gat.py:gat_attention_banded)
            if (
                self.use_pallas and F % 128 == 0
                and banded_flash_eligible(adj.shape)
                and flash3b_gat_supported(
                    TI=adj.shape[1], Wb=adj.shape[2], F=F, H=H
                )
            ):
                return gat_attention_banded_flash(
                    h, adj, W, att_src, att_dst, bias, concat=self.concat
                )
            return gat_attention_banded(
                h, adj, W, att_src, att_dst, bias, concat=self.concat
            )
        if adj is not None:
            # lane-aligned adj: fused flash kernel where one head of Wx fits
            # VMEM; tiled FA2-style kernel in the 2.5k-5k band; XLA dense
            # beyond (it wins there) — all the same math (ops/gat_flash.py)
            if self.use_pallas and F % 128 == 0:
                if (
                    adj.shape[0] % 128 == 0
                    and adj.shape[0] <= flash_dense_max_n(F, H)
                    and flash1_gat_supported(F, H)
                ):
                    return gat_attention_dense_flash(
                        h, adj, W, att_src, att_dst, bias, concat=self.concat
                    )
                if (
                    adj.shape[0] % TILE3_I == 0
                    and adj.shape[0] <= FLASH3_MAX_N
                    and flash3_gat_supported(F, H)
                ):
                    return gat_attention_dense_flash3(
                        h, adj, W, att_src, att_dst, bias, concat=self.concat
                    )
                if (
                    adj.shape[0] % flash2_tile()[1] == 0
                    and adj.shape[0] <= FLASH2_MAX_N
                    and flash2_gat_supported(F, H)
                ):
                    return gat_attention_dense_flash2(
                        h, adj, W, att_src, att_dst, bias, concat=self.concat
                    )
            return gat_attention_dense(
                h, adj, W, att_src, att_dst, bias, concat=self.concat
            )
        if self.rev_mode == "off":
            rev = None
        # Mosaic requires the per-head feature width to be lane-aligned
        # (multiples of 128); small widths always take the XLA path
        pallas_sel = (
            self.use_pallas and self.out_features % 128 == 0
            and n >= self.pallas_min_n
        )
        if pallas_sel:
            from spadot_tpu.ops.gat_pallas import gat_attention_pallas

            return gat_attention_pallas(
                h, nbr, nbr_mask, W, att_src, att_dst, bias, concat=self.concat,
                rev=(rev if self.rev_mode == "force" else None),
            )
        if self.rev_mode == "auto" and n > self.rev_max_n:
            rev = None
        return gat_attention(
            h, nbr, nbr_mask, W, att_src, att_dst, bias, concat=self.concat,
            rev=rev,
        )


class GATEncoder(nn.Module):
    hidden_dim: int
    num_heads: int
    z_dim: int
    use_pallas: bool = False
    param_dtype: Any = jnp.float32
    rev_mode: str = "auto"
    pallas_min_n: int = 4500
    rev_max_n: int = 3500

    @nn.compact
    def __call__(self, h, nbr, nbr_mask, rev=None, adj=None):
        kw = dict(use_pallas=self.use_pallas, param_dtype=self.param_dtype,
                  rev_mode=self.rev_mode, pallas_min_n=self.pallas_min_n,
                  rev_max_n=self.rev_max_n)
        h = nn.leaky_relu(
            GATLayer(self.hidden_dim, self.num_heads, concat=True, **kw)(h, nbr, nbr_mask, rev, adj), 0.01
        )
        h = nn.leaky_relu(
            GATLayer(self.hidden_dim, self.num_heads, concat=True, **kw)(h, nbr, nbr_mask, rev, adj), 0.01
        )
        h = GATLayer(self.hidden_dim, self.num_heads, concat=False, **kw)(h, nbr, nbr_mask, rev, adj)
        z = nn.Dense(self.z_dim * 2, kernel_init=_XAVIER,
                     param_dtype=self.param_dtype, dtype=self.param_dtype)(h)
        # last-axis split: identical for the 2-d (n, 2z) case and correct
        # for the nb-batched (nb, P, 2z) extraction input
        mu, logvar = jnp.split(z, 2, axis=-1)
        return mu, jnp.exp(jnp.clip(logvar, -15.0, 15.0))


class Decoder(nn.Module):
    hidden_dims: Sequence[int]
    output_dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        kw = dict(kernel_init=_XAVIER, param_dtype=self.param_dtype,
                  dtype=self.param_dtype)
        for width in self.hidden_dims:
            z = nn.Dense(width, **kw)(z)
            z = nn.LayerNorm(param_dtype=self.param_dtype, dtype=self.param_dtype)(z)
            z = nn.leaky_relu(z, 0.01)
        return nn.Dense(self.output_dim, **kw)(z)

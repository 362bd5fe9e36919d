"""Pallas TPU flash attention for YOLOv13 area attention.

Replaces the reference's flash_attn CUDA kernel dependency
(reference nn/modules/block.py:1200-1211, 1270-1279) with a TPU-native
single-pass online-softmax kernel:

  * grid = (batch*heads, Q blocks); K/V streamed through VMEM in BK-sized
    blocks inside a fori_loop — the (N, N) score matrix never hits HBM.
  * head_dim is zero-padded to the 128-lane width by the wrapper (zero lanes
    are exact no-ops for both QK^T and PV).
  * sequence padding is handled with -inf key masking, so any area chunk
    length works (areas fold into the batch dimension upstream).

Falls back to einsum attention off-TPU (interpret mode is used in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(n_valid_ref, q_ref, k_ref, v_ref, o_ref, *, bk: int, scale: float):
    """One (batch*head, q-block) program: online-softmax attention over K blocks.

    q_ref: (BQ, D), k_ref/v_ref: (N, D) full rows for this bh, o_ref: (BQ, D).
    """
    n_valid = n_valid_ref[0]
    q = q_ref[0].astype(jnp.float32) * scale
    bq, d = q.shape
    n = k_ref.shape[1]
    num_kb = n // bk

    def body(kb, carry):
        o, m, l = carry
        k = k_ref[0, pl.ds(kb * bk, bk), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (BQ, BK)
        kidx = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(kidx < n_valid, s, NEG_INF)
        m_new = jnp.maximum(m, s.max(-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(-1, keepdims=True)
        o_new = o * alpha + jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                                preferred_element_type=jnp.float32)
        return o_new, m_new, l_new

    o0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    o, m, l = jax.lax.fori_loop(0, num_kb, body, (o0, m0, l0))
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


def flash_area_attention(q, k, v, num_heads: int, area: int = 1,
                         interpret: bool | None = None):
    """Drop-in for ops used by AAttn: q, k, v are (B, N, C) with C = H*D.

    Returns (B, N, C). Pallas kernel forward; the backward pass recomputes
    attention with the einsum formulation (custom_vjp) — exact gradients, and
    the (Na, Na) score matrix only materializes during training where it is
    needed for the standard attention VJP anyway.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_area_attention_vjp(q, k, v, num_heads, area, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_area_attention_vjp(q, k, v, num_heads, area, interpret):
    return _flash_area_attention_impl(q, k, v, num_heads, area, interpret)


def _flash_fwd(q, k, v, num_heads, area, interpret):
    return _flash_area_attention_impl(q, k, v, num_heads, area, interpret), (q, k, v)


def _flash_bwd(num_heads, area, interpret, res, g):
    from sar_yolo_tpu.nn.modules.block import area_attention
    q, k, v = res
    _, vjp = jax.vjp(lambda qq, kk, vv: area_attention(qq, kk, vv, num_heads, area),
                     q, k, v)
    return vjp(g)


_flash_area_attention_vjp.defvjp(_flash_fwd, _flash_bwd)


def _flash_area_attention_impl(q, k, v, num_heads: int, area: int, interpret: bool):
    B, N, C = q.shape
    hd = C // num_heads
    scale = hd ** -0.5
    if area > 1:
        q = q.reshape(B * area, N // area, C)
        k = k.reshape(B * area, N // area, C)
        v = v.reshape(B * area, N // area, C)
    Ba, Na, _ = q.shape

    # (Ba, Na, H, hd) -> (Ba*H, Na, hd)
    def fold(t):
        return t.reshape(Ba, Na, num_heads, hd).transpose(0, 2, 1, 3).reshape(
            Ba * num_heads, Na, hd)

    qf, kf, vf = fold(q), fold(k), fold(v)

    d_pad = _round_up(hd, 128)
    n_pad = _round_up(Na, 128)
    bq = min(128, n_pad)
    bk = min(128, n_pad)
    pad_spec = ((0, 0), (0, n_pad - Na), (0, d_pad - hd))
    qf = jnp.pad(qf, pad_spec)
    kf = jnp.pad(kf, pad_spec)
    vf = jnp.pad(vf, pad_spec)
    BH = qf.shape[0]
    n_valid = jnp.full((1,), Na, jnp.int32)

    grid = (BH, n_pad // bq)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, bk=bk, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d_pad), lambda bh, qi, nv: (bh, qi, 0)),
                pl.BlockSpec((1, n_pad, d_pad), lambda bh, qi, nv: (bh, 0, 0)),
                pl.BlockSpec((1, n_pad, d_pad), lambda bh, qi, nv: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, d_pad), lambda bh, qi, nv: (bh, qi, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, n_pad, d_pad), q.dtype),
        interpret=interpret,
    )(n_valid, qf, kf, vf)

    out = out[:, :Na, :hd]
    out = out.reshape(Ba, num_heads, Na, hd).transpose(0, 2, 1, 3).reshape(Ba, Na, C)
    if area > 1:
        out = out.reshape(B, N, C)
    return out

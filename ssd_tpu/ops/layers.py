"""Elementwise transformer ops: RMSNorm, rotary embedding, SiLU-MLP glue.

Parity: /root/reference/ssd/layers/{layernorm,rotary_embedding,activation}.py.
On TPU these fuse into surrounding matmuls under jax.jit (SURVEY §2.2 N6), so
plain jnp is the native implementation; norms and rotary run in fp32 like the
reference (layernorm.py:21-26) to keep greedy outputs bit-comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)


def rms_norm_residual(
    x: jnp.ndarray, residual: jnp.ndarray, weight: jnp.ndarray, eps: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused add-residual RMSNorm: returns (norm(x+residual), x+residual)."""
    r = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rms_norm(r, weight, eps), r


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float):
    """cos/sin [T, hd/2] in fp32 computed on the fly (no table)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """HF-Llama rotate-half convention. x: [T, H, hd], cos/sin: [T, hd/2]."""
    half = x.shape[-1] // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[:, None, :]
    s = sin[:, None, :]
    o1 = x1 * c - x2 * s
    o2 = x2 * c + x1 * s
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


def silu_mul(gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    g = gate.astype(jnp.float32)
    return (g * (1.0 / (1.0 + jnp.exp(-g))) * up.astype(jnp.float32)).astype(gate.dtype)

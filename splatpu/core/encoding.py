"""NeRF-style positional encoding matching the reference's layout and quirk.

The reference's ``PositionalEncoding`` (`train.py:113-127`) computes, for input
x of shape (N, D) and frequency count F, an (N, 2F*D) embedding laid out as
channel-major blocks of size D:

    out[n, (2j)*D + d]   = sin(2^j * pi * x[n, d])
    out[n, (2j+1)*D + d] = cos(SIN(2^j * pi * x[n, d]))     # <- the quirk

The cos channel is cos *of the already-sin-overwritten* slice (`train.py:125`
reads ``embeddings[:, :, ::2]`` after :124 wrote sin into it).  We reproduce
this bit-for-bit by default (``quirk_compat=True``) so trained references and
this framework agree numerically; ``quirk_compat=False`` gives the intended
cos(2^j * pi * x).
"""

import jax.numpy as jnp


def positional_encoding(x, frequency_count: int, quirk_compat: bool = True):
    """x: (N, D) -> (N, 2 * frequency_count * D), layout as documented above."""
    freqs = (2.0 ** jnp.arange(frequency_count)) * jnp.pi  # (F,)
    phases = x[:, :, None] * freqs  # (N, D, F)
    s = jnp.sin(phases)
    c = jnp.cos(s) if quirk_compat else jnp.cos(phases)
    # Interleave per-frequency: (N, D, F, 2) -> permute to (N, 2F, D) -> flatten.
    interleaved = jnp.stack([s, c], axis=-1).reshape(x.shape[0], x.shape[1], -1)
    return jnp.transpose(interleaved, (0, 2, 1)).reshape(x.shape[0], -1)


def encoded_dim(input_dim: int, frequency_count: int) -> int:
    return 2 * frequency_count * input_dim

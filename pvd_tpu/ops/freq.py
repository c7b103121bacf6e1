"""Classic NeRF frequency positional encoding.

Parity target: tools/encoding.py:6-49 (FreqEncoder) — include_input followed
by interleaved sin/cos per log-spaced frequency band: for each band f,
append sin(f*x) then cos(f*x) over the full input vector.
"""

import numpy as np
import jax.numpy as jnp


def freq_output_dim(input_dim: int, n_freqs: int, include_input: bool = True) -> int:
    out = input_dim if include_input else 0
    return out + input_dim * n_freqs * 2


def freq_bands(n_freqs: int, log_sampling: bool = True):
    max_freq_log2 = n_freqs - 1
    if log_sampling:
        return (2.0 ** np.linspace(0.0, max_freq_log2, n_freqs)).astype(np.float32)
    return np.linspace(1.0, 2.0**max_freq_log2, n_freqs).astype(np.float32)


def freq_encode(x, n_freqs: int, include_input: bool = True):
    """x: [..., D]. Returns [..., D*(1 + 2*n_freqs)] (with include_input)."""
    bands = freq_bands(n_freqs)
    out = [x] if include_input else []
    for f in bands:
        xf = x * f
        out.append(jnp.sin(xf))
        out.append(jnp.cos(xf))
    return jnp.concatenate(out, axis=-1)

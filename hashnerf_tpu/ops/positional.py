"""Classic NeRF sin/cos positional (Fourier) encoding.

Capability parity: /root/reference/embedding/embedder.py:10-40 (Embedder).
Concat order matches the reference: [x, sin(f0 x), cos(f0 x), sin(f1 x), ...].
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PositionalConfig:
    num_freqs: int = 10
    max_freq_log2: int = 9  # reference passes multires-1
    input_dims: int = 3
    include_input: bool = True
    log_sampling: bool = True

    @property
    def out_dim(self) -> int:
        d = self.input_dims
        out = d if self.include_input else 0
        return out + 2 * self.num_freqs * d

    @property
    def freq_bands(self):
        if self.log_sampling:
            return tuple(
                float(f) for f in 2.0 ** np.linspace(0.0, self.max_freq_log2, self.num_freqs)
            )
        return tuple(
            float(f) for f in np.linspace(2.0**0.0, 2.0**self.max_freq_log2, self.num_freqs)
        )


def positional_encode(x: jnp.ndarray, cfg: PositionalConfig) -> jnp.ndarray:
    """x: (..., input_dims) -> (..., out_dim)."""
    parts = [x] if cfg.include_input else []
    for f in cfg.freq_bands:
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)

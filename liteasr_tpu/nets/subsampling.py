"""Conv2D subsampling front-end: T -> ~T/4 (liteasr/nets/subsampling.py:9-48).

Channel-last for the XLA TPU conv layout: (B, T, F) -> (B, T, F, 1) ->
two stride-2 VALID 3x3 convs -> (B, T', F', C) -> flatten -> Dense.
The output length formula ((T-1)//2-1)//2 is the contract the CTC pred_len
depends on (liteasr/models/u2.py:319-321).
"""

import flax.linen as nn
import jax.numpy as jnp


def subsampled_length(t: int) -> int:
    return ((t - 1) // 2 - 1) // 2


class Conv2DSubsampling(nn.Module):
    o_dim: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x[..., None]  # (B, T, F, 1)
        x = nn.Conv(self.o_dim, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.o_dim, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        return nn.Dense(self.o_dim, dtype=self.dtype, name="out")(x)

"""LSTM prediction network for the transducer.

Reference: liteasr/nets/rnn_decoder.py:10-80 — embedding(pad=0) + N LSTMCell
layers with an explicit python time loop. Here the time loop is a
``flax.linen.RNN`` (``lax.scan`` under the hood) per layer, and single-step
stepping for decoding is exposed via ``step``.
"""

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp


class RNNDecoder(nn.Module):
    vocab_size: int
    h_dim: int
    h_units: int
    n_layer: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # reference init: embed ~ N(0, 1), linears lecun-normal (the flax
        # default). The LSTM forget-bias=1 detail (reference
        # nets/initialization.py:50-55 via models/transducer.py:243-251 sets
        # the f quarter of bias_ih to 1; bias_hh stays zero) is NOT a flax
        # default — flax zero-inits every gate bias — so it is applied by
        # ``forget_bias_ones`` below as a post-init params edit. flax's
        # OptimizedLSTMCell carries its only bias on the h-side gates
        # ('hf'), so hf.bias = 1 gives the identical effective forget bias.
        self.embed = nn.Embed(
            self.vocab_size, self.h_dim, dtype=self.dtype,
            embedding_init=nn.initializers.normal(stddev=1.0))
        self.rnns = [
            nn.RNN(nn.OptimizedLSTMCell(self.h_units, dtype=self.dtype),
                   name=f"rnn_{i}")
            for i in range(self.n_layer)
        ]
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, ys, train: bool = False):
        """:param ys: (B, L) token ids -> (B, L, h_units)."""
        h = self.embed(ys)
        h = self.dropout(h, deterministic=not train)
        for i in range(self.n_layer):
            h = self.rnns[i](h)
            h = self.dropout(h, deterministic=not train)
        return h

    def init_state(self, batch: int) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        zeros = jnp.zeros((batch, self.h_units), self.dtype)
        return [(zeros, zeros) for _ in range(self.n_layer)]

    def step(self, tok, state):
        """One decode step: tok (B,) int -> (out (B, h_units), new_state)."""
        h = self.embed(tok)
        new_state = []
        for i in range(self.n_layer):
            carry, h = self.rnns[i].cell(tuple(state[i]), h)
            new_state.append(carry)
        return h, new_state


def forget_bias_ones(dec_params: dict) -> dict:
    """Set every LSTM layer's forget-gate bias to 1 in an RNNDecoder params
    subtree (reference nets/initialization.py:50-55: bias_ih[n/4:n/2] = 1,
    torch gate order i,f,g,o -> the f gate). Returns a new tree."""
    out = dict(dec_params)
    for name, sub in dec_params.items():
        if name.startswith("rnn_") and "cell" in sub:
            cell = dict(sub["cell"])
            hf = dict(cell["hf"])
            hf["bias"] = jnp.ones_like(hf["bias"])
            cell["hf"] = hf
            out[name] = {**sub, "cell": cell}
    return out

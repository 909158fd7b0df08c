"""Feature Pyramid Network neck — flax.linen, NHWC.

TPU-native re-design of the reference's FPN
(reference: lib/modeling/FPN.py ~550 LoC: fpn_ResNet50_conv5_body,
topdown_lateral_module, P6 via subsampling).

P2..P5 from lateral 1x1 + nearest top-down upsample + 3x3 smoothing;
P6 = stride-2 max-pool of P5 (Detectron: subsampled P5, used by RPN only).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from .convs import Conv


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbour upsample, NHWC — pure reshape/broadcast (no
    gather), fuses into the following add on TPU."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class FPN(nn.Module):
    """Builds P_min..P_max from backbone stages C2..C5.

    Input: tuple (C2, C3, C4, C5) NHWC. Output: tuple (P2, P3, P4, P5[, P6]).
    """

    dim: int = 256
    min_level: int = 2
    max_level: int = 6  # 6 adds the max-pool P6 (RPN-only level)
    # GroupNorm after lateral + output convs (reference: FPN.USE_GN,
    # gn_baselines/; convs lose their bias when normed).
    use_gn: bool = False
    gn_groups: int = 32
    gn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        assert len(feats) == 4, "expected (C2, C3, C4, C5)"
        c2, c3, c4, c5 = feats

        def norm(x, name):
            if not self.use_gn:
                return x
            return nn.GroupNorm(num_groups=self.gn_groups, epsilon=self.gn_eps,
                                name=name)(x)

        laterals = []
        for i, c in enumerate((c2, c3, c4, c5)):
            lat = Conv(self.dim, (1, 1), use_bias=not self.use_gn,
                          dtype=self.dtype, name=f"lateral_c{i + 2}")(c)
            laterals.append(norm(lat, f"lateral_gn_c{i + 2}"))

        # Top-down pathway.
        tds = [laterals[3]]
        for i in (2, 1, 0):
            tds.insert(0, laterals[i] + nearest_upsample_2x(tds[0]))

        ps = []
        for i, td in enumerate(tds):
            p = Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=not self.use_gn,
                        dtype=self.dtype, name=f"output_p{i + 2}")(td)
            ps.append(norm(p, f"output_gn_p{i + 2}"))

        if self.max_level >= 6:
            # Detectron FPN: P6 is stride-2 subsampling of P5.
            p6 = nn.max_pool(ps[-1], (1, 1), strides=(2, 2))
            ps.append(p6)
        lo = self.min_level - 2
        return tuple(ps[lo:])

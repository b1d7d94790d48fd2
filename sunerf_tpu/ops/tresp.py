"""AIA temperature-response tables and their differentiable, fully-vectorized
evaluation.

Replaces the reference's per-wavelength Python loop with .detach().cpu() host
syncs inside the training step (density_temperature.py:244-256, SURVEY §2.5-5):
wavelength values are matched against the static channel list with a one-hot
comparison, all 7 channel responses are interpolated in one vectorized pass,
and the per-ray selection is a tiny [W,7]x[7,S] contraction — no host round
trips, no data-dependent control flow.

The table itself is parsed from the reference's calibration asset
(sunerf/data/aia_temp_resp.genx) by sunerf_tpu.data.genx and cached as npz; the
response is multiplied by the typical AIA exposure time (2.9 s) at load, as the
reference does (density_temperature.py:142).
"""
from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from sunerf_tpu.models.fields import AIA_WAVELENGTHS

_ASSET_DIR = os.path.join(os.path.dirname(__file__), '..', 'assets')
DEFAULT_NPZ = os.path.abspath(os.path.join(_ASSET_DIR, 'aia_temp_resp.npz'))
DEFAULT_AIA_EXP_TIME = 2.9  # seconds (reference density_temperature.py:99)


@dataclasses.dataclass(frozen=True, eq=False)
class TemperatureResponse:
    """Per-channel temperature response R(logT) on a shared logT grid.

    logte: [G] log10 temperature grid (ascending, UNIFORM spacing — the
        shipped AIA table is 4.0..9.0 step 0.05; load_aia_response asserts it).
    tresp: [C, G] response per channel, channel order == AIA_WAVELENGTHS.
    """
    logte: jnp.ndarray
    tresp: jnp.ndarray
    wavelengths: tuple = AIA_WAVELENGTHS

    def evaluate_all(self, log_t: jnp.ndarray) -> jnp.ndarray:
        """Interpolate every channel's response at log_t.

        Args:
            log_t: [...] log10 temperatures.
        Returns:
            [C, ...] responses; 0 outside the table range (extrap=0, matching
            xitorch Interp1D(extrap=0) in the reference).
        """
        out = self.evaluate_channels_last(log_t)
        return jnp.moveaxis(out, -1, 0)

    def evaluate_channels_last(self, log_t: jnp.ndarray) -> jnp.ndarray:
        """[..., C] variant, gather-free: jnp.interp lowers to per-element
        gathers (~20 ms/step at batch 1024 x 7 channels on TPU); on the
        uniform logte grid the lookup is a one-hot interpolation-weight matrix
        times the [G, C] table — one MXU matmul."""
        g0 = self.logte[0]
        dt = self.logte[1] - self.logte[0]
        G = self.logte.shape[0]
        flat = log_t.reshape(-1)
        pos = (flat - g0) / dt
        i0 = jnp.clip(jnp.floor(pos), 0, G - 2)
        frac = pos - i0
        inside = (pos >= 0.0) & (pos <= G - 1)
        iota = jnp.arange(G, dtype=pos.dtype)
        # W[n, g] = (g==i0)*(1-frac) + (g==i0+1)*frac, zeroed outside the grid
        w = ((iota == i0[:, None]) * (1.0 - frac[:, None])
             + (iota == i0[:, None] + 1.0) * frac[:, None])
        w = w * inside[:, None]
        out = jnp.dot(w, self.tresp.T, preferred_element_type=jnp.float32)
        return out.reshape(log_t.shape + (self.tresp.shape[0],))

    def channel_onehot(self, wavelengths: jnp.ndarray) -> jnp.ndarray:
        """One-hot channel membership for wavelength values; all-zero rows for
        padding (wavelength == 0), which zeroes both response and absorption —
        exactly the reference's 'skip wavelength 0' semantics.

        Args:
            wavelengths: [...] wavelength values (94..335, 0 = absent).
        Returns:
            [..., C] float one-hot.
        """
        known = jnp.asarray(self.wavelengths, wavelengths.dtype)
        return (wavelengths[..., None] == known).astype(jnp.float32)


def load_aia_response(path: str = DEFAULT_NPZ,
                      aia_exp_time: float = DEFAULT_AIA_EXP_TIME) -> TemperatureResponse:
    """Load the packaged AIA response table (npz with 'logte' [G] and
    'tresp' [C, G]); multiplies by the exposure time."""
    with np.load(path) as f:
        logte_np = np.asarray(f['logte'], np.float32)
        tresp = jnp.asarray(f['tresp'], jnp.float32) * aia_exp_time
    steps = np.diff(logte_np)
    assert np.allclose(steps, steps[0], rtol=1e-3), \
        'response grid must be uniform (gather-free lookup assumes it)'
    return TemperatureResponse(logte=jnp.asarray(logte_np), tresp=tresp)


def convert_genx_to_npz(genx_path: str, npz_path: str = DEFAULT_NPZ) -> None:
    """Parse an SSW genx response file and cache it as npz (offline, host-side).

    Channels are resampled onto the union of their logT grids so a single
    shared grid serves all channels (they are identical in the shipped asset).
    """
    from sunerf_tpu.data.genx import read_genx
    data = read_genx(genx_path)
    grids, resps = [], {}
    for wl in AIA_WAVELENGTHS:
        ch = data[f'A{wl}']
        grids.append(np.asarray(ch['LOGTE'], np.float64))
        resps[wl] = np.asarray(ch['TRESP'], np.float64)
    common = np.unique(np.concatenate(grids))
    tresp = np.stack([
        np.interp(common, g, resps[wl], left=0.0, right=0.0)
        for g, wl in zip(grids, AIA_WAVELENGTHS)])
    os.makedirs(os.path.dirname(npz_path), exist_ok=True)
    np.savez(npz_path, logte=common.astype(np.float32),
             tresp=tresp.astype(np.float32),
             wavelengths=np.asarray(AIA_WAVELENGTHS, np.int32))

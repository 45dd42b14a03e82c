"""Per-program roofline / MFU accounting (BASELINE.json's "speed-of-light"
clause): XLA's own cost model (`Compiled.cost_analysis()` — flops and HBM
bytes) against the chip's peak FLOP rate and HBM bandwidth.

The reference has no analog (it never measures anything, SURVEY.md §6); g2o's
`G2OBatchStatistics` records wall times only. Here every perf claim can carry
  - mfu:        achieved FLOP/s over peak FLOP/s,
  - hbm_frac:   achieved bytes/s over peak HBM bytes/s,
  - bound:      which wall the program is nearer to ("mxu" when its
                arithmetic intensity exceeds the machine balance, else "hbm"),
  - sol_frac:   distance to that wall — achieved/attainable throughput, where
                attainable = min(peak_flops, intensity * peak_bw). This is
                the honest "percent of speed of light" number: a tiny-FLOP
                HBM-bound program can have 1% MFU while sitting at 80% of
                its actual roof.
"""

from __future__ import annotations

from typing import NamedTuple


class DevicePeaks(NamedTuple):
    name: str
    peak_flops: float  # FLOP/s (dense matmul peak for the dtype convention)
    peak_bw: float  # HBM bytes/s


# Published peaks. MFU convention: bf16 MXU peak — the rate the MXU delivers
# for the bf16/f32-accumulate matmuls the hot kernels use. f32 HIGHEST
# matmuls run ~6 passes (~1/6 of this peak); their MFU is reported against
# the same bf16 peak so numbers stay comparable across kernels.
_PEAKS = {
    "v5 lite": DevicePeaks("TPU v5e", 197.0e12, 819.0e9),
    "v5e": DevicePeaks("TPU v5e", 197.0e12, 819.0e9),
    "v5p": DevicePeaks("TPU v5p", 459.0e12, 2765.0e9),
    "v4": DevicePeaks("TPU v4", 275.0e12, 1228.0e9),
    "cpu": DevicePeaks("host CPU (nominal)", 1.0e12, 100.0e9),
}


def device_peaks(device=None) -> DevicePeaks:
    import jax

    dev = device or jax.devices()[0]
    label = f"{getattr(dev, 'device_kind', '')} {dev.platform}".lower()
    for key, peaks in _PEAKS.items():
        if key in label:
            return peaks
    return _PEAKS["cpu"] if "cpu" in label else _PEAKS["v5 lite"]


class Roofline(NamedTuple):
    flops: float
    bytes: float
    wall_s: float
    intensity: float  # flops per HBM byte
    mfu: float  # achieved / peak FLOP rate
    hbm_frac: float  # achieved / peak HBM rate
    bound: str  # "mxu" | "hbm"
    sol_frac: float  # achieved / attainable under the roofline

    def as_dict(self) -> dict:
        return {
            "flops": self.flops,
            "bytes": self.bytes,
            "wall_ms": round(self.wall_s * 1e3, 3),
            "intensity_flop_per_byte": round(self.intensity, 2),
            "mfu": round(self.mfu, 4),
            "hbm_frac": round(self.hbm_frac, 4),
            "bound": self.bound,
            "sol_frac": round(self.sol_frac, 4),
        }


def analyze(compiled, wall_s: float, peaks: DevicePeaks | None = None) -> Roofline:
    """Roofline numbers for one compiled program measured at `wall_s` per
    call. `compiled` is a `jax.stages.Compiled` (use jit(f).lower(...).compile())."""
    peaks = peaks or device_peaks()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    intensity = flops / max(byts, 1.0)
    mfu = flops / max(wall_s, 1e-12) / peaks.peak_flops
    hbm = byts / max(wall_s, 1e-12) / peaks.peak_bw
    balance = peaks.peak_flops / peaks.peak_bw  # flop/byte machine balance
    bound = "mxu" if intensity >= balance else "hbm"
    attainable = min(peaks.peak_flops, intensity * peaks.peak_bw)  # flop/s
    sol = (flops / max(wall_s, 1e-12)) / attainable if flops > 0 else hbm
    return Roofline(flops, byts, wall_s, intensity, mfu, hbm, bound, min(sol, 1.0))

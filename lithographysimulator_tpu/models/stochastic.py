"""Stochastic resist: photon shot noise, acid statistics, LER/LWR/LCDU and
stochastic defect rates from Monte-Carlo printed-contour ensembles.

Modern (EUV-era) lithography is photon-starved: the same aerial image prints
differently every exposure because photon absorption and photo-acid
generation are counting processes. This module adds the standard simplified
stochastic chain on top of the deterministic resist models
(:mod:`.resist`):

    relative image I(x)
      -> absorbed photons  N(x) ~ Poisson(dose * A_px * I(x))
      -> generated acids   a(x) = QE * N(x), optionally PAG-depletion
         saturated a -> PAG * (1 - exp(-a / PAG))
      -> acid diffusion    Gaussian blur (sigma = diffusion_nm)
      -> develop           threshold -> binary contour

vmapped over trials with split PRNG keys — one jitted program per ensemble,
TPU-friendly (static shapes, FFT blur, no data-dependent control flow). The
metrics (line-edge roughness, linewidth roughness, local CD uniformity,
bridge/break defect rates) reuse the vectorized subpixel edge extraction of
:func:`.resist.feature_table`.

No reference counterpart: resist modeling is the reference's own unchecked
roadmap item (reference ``README.md:19``) and it has no stochastic modeling
at all. Physics per the standard photon/acid counting models (Gallatin,
"Resist blur and line edge roughness"; Mack's stochastic resist columns):
LER ~ 1/sqrt(dose) at fixed blur, saturating at the image log-slope limit.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OpticsConfig


@dataclasses.dataclass(frozen=True)
class StochasticResist:
    """Counting-statistics resist model.

    dose_photons_per_nm2: absorbed-photon areal density at relative
        intensity 1.0. Scale anchors: 30 mJ/cm^2 at EUV (92 eV) is ~20
        photons/nm^2; the same dose at ArF (6.4 eV) is ~290 photons/nm^2 —
        which is why stochastics dominate EUV and are a refinement at DUV.
    quantum_efficiency: acids generated per absorbed photon.
    pag_per_nm2: photo-acid generator areal density for depletion
        saturation (0 disables: acid strictly proportional to photons).
    diffusion_nm: Gaussian acid-diffusion length (1-sigma, nm).
    threshold: develop threshold on the normalized deprotection field (the
        zero-noise limit of this model is exactly
        :meth:`.resist.ResistModel.develop_binary` at the same threshold
        and blur when pag_per_nm2 = 0).
    noise: 'poisson' (exact counting statistics) or 'gaussian'
        (mean + sqrt(mean) * normal — indistinguishable above ~50
        photons/pixel and cheaper to sample).
    """

    dose_photons_per_nm2: float = 20.0
    quantum_efficiency: float = 1.0
    pag_per_nm2: float = 0.0
    diffusion_nm: float = 5.0
    threshold: float = 0.3
    noise: str = "poisson"

    def __post_init__(self):
        if self.dose_photons_per_nm2 <= 0:
            raise ValueError("dose_photons_per_nm2 must be > 0")
        if not (0 < self.quantum_efficiency <= 1.0):
            raise ValueError("quantum_efficiency must be in (0, 1]")
        if self.noise not in ("poisson", "gaussian"):
            raise ValueError(f"noise must be poisson/gaussian, got {self.noise!r}")

    # -- single-trial chain (jit/vmap-friendly) -----------------------------

    def _diffusion_transfer(self, n: int, config: OpticsConfig) -> np.ndarray:
        freqs = np.fft.fftfreq(n, d=config.pixel_size)  # cycles/nm
        return np.exp(-2.0 * (np.pi * self.diffusion_nm) ** 2
                      * (freqs[None, :] ** 2 + freqs[:, None] ** 2))

    def deprotection(self, key, image: jnp.ndarray,
                     config: OpticsConfig) -> jnp.ndarray:
        """One stochastic (diffusion-blurred) deprotection FIELD for one
        PRNG key — the continuous field, so threshold crossings stay
        subpixel for the roughness metrics; the printed contour is
        ``field > threshold``.

        ``image`` is a raw aerial image (normalized internally by its max,
        matching the deterministic models' convention)."""
        rel = image / jnp.maximum(jnp.max(image), 1e-30)
        area = config.pixel_size ** 2
        mean_photons = self.dose_photons_per_nm2 * area * rel
        if self.noise == "poisson":
            n_ph = jax.random.poisson(key, mean_photons).astype(jnp.float32)
        else:
            n_ph = mean_photons + jnp.sqrt(mean_photons) * jax.random.normal(
                key, mean_photons.shape, jnp.float32)
            n_ph = jnp.maximum(n_ph, 0.0)
        acid = self.quantum_efficiency * n_ph
        norm = self.dose_photons_per_nm2 * area * self.quantum_efficiency
        if self.pag_per_nm2 > 0:
            pag = self.pag_per_nm2 * area
            acid = pag * (1.0 - jnp.exp(-acid / pag))
            norm = pag * (1.0 - np.exp(-norm / pag))
        depro = acid / norm
        if self.diffusion_nm > 0:
            transfer = jnp.asarray(
                self._diffusion_transfer(image.shape[-1], config),
                jnp.complex64)
            depro = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(depro) * transfer))
        return depro

    def contour(self, key, image: jnp.ndarray,
                config: OpticsConfig) -> jnp.ndarray:
        """One stochastic printed contour {0,1} for one PRNG key."""
        return (self.deprotection(key, image, config)
                > self.threshold).astype(jnp.float32)

    def deterministic_field(self, image: jnp.ndarray,
                            config: OpticsConfig) -> jnp.ndarray:
        """Zero-noise (infinite-dose) deprotection field."""
        rel = image / jnp.maximum(jnp.max(image), 1e-30)
        if self.diffusion_nm > 0:
            transfer = jnp.asarray(
                self._diffusion_transfer(image.shape[-1], config),
                jnp.complex64)
            rel = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(rel) * transfer))
        return rel

    def deterministic_contour(self, image: jnp.ndarray,
                              config: OpticsConfig) -> jnp.ndarray:
        """Zero-noise limit of :meth:`contour` — the reference contour that
        defect rates compare against."""
        return (self.deterministic_field(image, config)
                > self.threshold).astype(jnp.float32)

    # -- volumetric (in-film) chain -----------------------------------------

    def _z_blur(self, nz: int, dz_nm: float) -> np.ndarray:
        """Row-normalized Gaussian acid-diffusion matrix over slab centers
        (reflecting film boundaries: acid stays in the film, so each row
        renormalizes rather than leaking)."""
        z = np.arange(nz, dtype=np.float64) * float(dz_nm)
        g = np.exp(-0.5 * ((z[:, None] - z[None, :])
                           / max(self.diffusion_nm, 1e-9)) ** 2)
        return (g / g.sum(axis=1, keepdims=True)).astype(np.float32)

    def deprotection_volume(self, key, image_stack: jnp.ndarray,
                            config: OpticsConfig, *,
                            dz_nm: float) -> jnp.ndarray:
        """One stochastic (nz, n, n) deprotection VOLUME for one PRNG key —
        per-slab counting statistics on the rigorous in-film exposure
        (:func:`...simulate.film_stack_images`).

        The areal photon dose splits across the ``nz`` slabs (each slab
        absorbs ``dose/nz`` per unit area at relative intensity 1, scaled
        by the LOCAL rigorous intensity normalized to the stack max), so a
        thin slab sees proportionally fewer photons and proportionally
        larger shot noise — the mechanism that makes the dim standing-wave
        nodes near the resist bottom the stochastic hot spots (footing/
        bridging live there). PAG depletion saturates per voxel against the
        per-slab PAG budget. Acid diffusion is 3-D: the usual periodic
        in-plane FFT blur times a reflecting Gaussian along z over slab
        centers (``dz_nm`` spacing). ``nz = 1`` reduces EXACTLY to
        :meth:`deprotection` (same key, same field) — pinned by
        tests/test_stochastic_volume.py."""
        stack = jnp.asarray(image_stack)
        nz = stack.shape[0]
        rel = stack / jnp.maximum(jnp.max(stack), 1e-30)
        area = config.pixel_size ** 2
        slab_dose = self.dose_photons_per_nm2 * area / nz
        mean_photons = slab_dose * rel
        if self.noise == "poisson":
            n_ph = jax.random.poisson(key, mean_photons).astype(jnp.float32)
        else:
            n_ph = mean_photons + jnp.sqrt(mean_photons) * jax.random.normal(
                key, mean_photons.shape, jnp.float32)
            n_ph = jnp.maximum(n_ph, 0.0)
        acid = self.quantum_efficiency * n_ph
        norm = slab_dose * self.quantum_efficiency
        if self.pag_per_nm2 > 0:
            pag = self.pag_per_nm2 * area / nz
            acid = pag * (1.0 - jnp.exp(-acid / pag))
            norm = pag * (1.0 - np.exp(-norm / pag))
        depro = acid / norm
        if self.diffusion_nm > 0:
            transfer = jnp.asarray(
                self._diffusion_transfer(stack.shape[-1], config),
                jnp.complex64)
            depro = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(depro)
                                           * transfer[None]))
            if nz > 1:
                blur = jnp.asarray(self._z_blur(nz, dz_nm))
                depro = jnp.einsum("zw,wyx->zyx", blur, depro)
        return depro

    def deterministic_volume(self, image_stack: jnp.ndarray,
                             config: OpticsConfig, *,
                             dz_nm: float) -> jnp.ndarray:
        """Zero-noise (infinite-dose) limit of :meth:`deprotection_volume`:
        the jointly-normalized, 3-D-blurred exposure stack."""
        stack = jnp.asarray(image_stack)
        nz = stack.shape[0]
        rel = stack / jnp.maximum(jnp.max(stack), 1e-30)
        if self.diffusion_nm > 0:
            transfer = jnp.asarray(
                self._diffusion_transfer(stack.shape[-1], config),
                jnp.complex64)
            rel = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(rel) * transfer[None]))
            if nz > 1:
                blur = jnp.asarray(self._z_blur(nz, dz_nm))
                rel = jnp.einsum("zw,wyx->zyx", blur, rel)
        return rel


_HOST_FIELD_BYTES = 1 << 30  # max bytes of trial fields held at once


@functools.lru_cache(maxsize=32)
def _compiled_trials(model: StochasticResist, config: OpticsConfig,
                     binary: bool, trial_chunk: int):
    """Cached jitted trial program per (model, config, form): repeated
    ensembles (dose sweeps, benchmarks, serving) must not re-trace — a
    fresh jit closure per call would recompile every time, minutes each
    through the TPU tunnel."""
    one = model.contour if binary else model.deprotection

    @jax.jit
    def run(image, keys):
        def chunk_fn(kc):
            return jax.vmap(lambda k: one(k, image, config))(kc)

        m = keys.shape[0]
        c = min(trial_chunk, m)
        if m % c:
            return chunk_fn(keys)
        out = jax.lax.map(chunk_fn, keys.reshape(m // c, c, 2))
        return out.reshape(m, *image.shape)

    return run


@functools.lru_cache(maxsize=32)
def _compiled_trial_summary(model: StochasticResist, config: OpticsConfig,
                            trial_chunk: int, row_step: int, axis: int):
    """Cached jitted ensemble-summary program: per trial, keep only what
    the metrics consume — the row_step-sampled CONTINUOUS field cut lines
    (subpixel edge statistics), the per-cut-line run counts of the binary
    contour (defect rates), and the summed contour (probability band).
    Full-chip ensembles are tunnel-transfer-bound (16 x 4096^2 f32 fields
    are ~1 GB at ~25 MB/s effective); this summary moves ~5x less."""

    def run(image, keys):
        img = image if axis == 1 else image.T

        def one(k):
            depro = model.deprotection(k, img, config)
            contour = depro > model.threshold
            padded = jnp.pad(contour, ((0, 0), (1, 1)))
            runs = jnp.sum(
                (padded[:, 1:].astype(jnp.int8)
                 - padded[:, :-1].astype(jnp.int8)) == 1,
                axis=1).astype(jnp.int32)
            return depro[::row_step], runs, contour.astype(jnp.float32)

        def chunk_fn(band, kc):
            rows, runs, contours = jax.vmap(one)(kc)
            return band + contours.sum(axis=0), (rows, runs)

        m = keys.shape[0]
        c = min(trial_chunk, m)
        band0 = jnp.zeros(img.shape, jnp.float32)
        if m % c:
            band, (rows, runs) = chunk_fn(band0, keys)
            return rows, runs, band
        band, (rows, runs) = jax.lax.scan(
            chunk_fn, band0, keys.reshape(m // c, c, 2))
        return (rows.reshape(m, *rows.shape[2:]),
                runs.reshape(m, runs.shape[-1]), band)

    return jax.jit(run)


def exposure_summary(image, config: OpticsConfig, model: StochasticResist,
                     *, trials: int, seed: int = 0, trial_chunk: int = 16,
                     row_step: int = 1, axis: int = 1):
    """(field_rows (T, ceil(n/row_step), n), run_counts (T, n), band_sum
    (n, n)) for ``trials`` stochastic exposures — the transfer-lean device
    summary :func:`stochastic_ensemble` consumes (cut lines along ``axis``;
    outputs are already in cut-line-major orientation)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), trials)
    run = _compiled_trial_summary(model, config, trial_chunk, row_step, axis)
    return run(jnp.asarray(image), keys)


def exposure_trials(image, config: OpticsConfig, model: StochasticResist,
                    *, trials: int = 64, seed: int = 0,
                    trial_chunk: int = 16, binary: bool = True) -> jnp.ndarray:
    """(trials, n, n) stochastic exposures, one jitted program: binary
    printed contours (default) or the continuous deprotection fields
    (``binary=False`` — what the subpixel roughness metrics consume).

    vmap inside, ``lax.map`` over chunks of trials to bound live memory
    (64 trials at 1024^2 f32 is 268 MB live if vmapped flat)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), trials)
    run = _compiled_trials(model, config, binary, trial_chunk)
    return run(jnp.asarray(image), keys)


@functools.lru_cache(maxsize=16)
def _compiled_volume_summary(model: StochasticResist, config: OpticsConfig,
                             dz_nm: float, trial_chunk: int, row_step: int,
                             axis: int):
    """Cached jitted volumetric-ensemble summary: per trial, the
    row-sampled continuous deprotection cut lines PER SLAB, the per-slab
    per-cut-line run counts, and the summed (nz, n, n) contour volume —
    the 3-D analog of :func:`_compiled_trial_summary`, one compiled
    program per (model, stack shape, sampling) so repeated ensembles do
    not re-trace."""

    def run(stack, keys):
        st = stack if axis == 1 else jnp.transpose(stack, (0, 2, 1))

        def one(k):
            depro = model.deprotection_volume(k, st, config, dz_nm=dz_nm)
            contour = depro > model.threshold
            padded = jnp.pad(contour, ((0, 0), (0, 0), (1, 1)))
            runs = jnp.sum(
                (padded[..., 1:].astype(jnp.int8)
                 - padded[..., :-1].astype(jnp.int8)) == 1,
                axis=-1).astype(jnp.int32)
            return depro[:, ::row_step], runs, contour.astype(jnp.float32)

        def chunk_fn(band, kc):
            rows, runs, contours = jax.vmap(one)(kc)
            return band + contours.sum(axis=0), (rows, runs)

        m = keys.shape[0]
        c = min(trial_chunk, m)
        band0 = jnp.zeros(st.shape, jnp.float32)
        if m % c:
            band, (rows, runs) = chunk_fn(band0, keys)
            return rows, runs, band
        band, (rows, runs) = jax.lax.scan(
            chunk_fn, band0, keys.reshape(m // c, c, 2))
        return (rows.reshape(m, *rows.shape[2:]),
                runs.reshape(m, *runs.shape[2:]), band)

    return jax.jit(run)


def stochastic_volume_ensemble(image_stack, config: OpticsConfig,
                               model: StochasticResist | None = None, *,
                               dz_nm: float, trials: int = 32, seed: int = 0,
                               axis: int = 1, row_step: int | None = None,
                               trial_chunk: int = 8) -> dict:
    """Monte-Carlo VOLUMETRIC stochastic printing summary for one rigorous
    (nz, n, n) in-film exposure stack (:func:`...simulate.film_stack_images`)
    — the z-resolved analog of :func:`stochastic_ensemble`.

    Per slab: LER/LWR (3σ, nm), LCDU across trials, mean CD, and
    bridge/break defect rates against that slab's own deterministic
    contour. Depth-dependent stochastics fall out directly: the dim
    standing-wave nodes near the resist bottom run at locally lower photon
    counts AND lower image contrast, so their slabs show elevated LER and
    bridging (footing) relative to the top — the failure modes a 2-D
    (single-plane) stochastic model cannot represent. Also returns the
    (nz, n, n) per-voxel print probability, the volumetric stochastic
    band; feed its mean contour to the 3-D develop
    (:meth:`..resist.DepthResist.develop_profile`) machinery for
    profile-level analyses.

    ``dz_nm`` is the slab spacing of the exposure stack (typically
    ``resist.mack.thickness_nm / resist.nz``)."""
    model = model or StochasticResist()
    stack = np.asarray(image_stack, np.float32)
    nz, n = stack.shape[0], stack.shape[-1]
    if row_step is None:
        row_step = max(1, n // 512)
    det = np.asarray(jax.jit(functools.partial(
        model.deterministic_volume, config=config, dz_nm=float(dz_nm)))(
            jnp.asarray(stack)))
    run = _compiled_volume_summary(model, config, float(dz_nm),
                                   min(trial_chunk, trials), row_step, axis)
    keys = jax.random.split(jax.random.PRNGKey(seed), trials)
    rows_d, runs_d, band_d = run(jnp.asarray(stack), keys)
    rows, runs, band = (np.asarray(rows_d), np.asarray(runs_d),
                        np.asarray(band_d))

    det_or = det if axis == 1 else det.transpose(0, 2, 1)
    slabs = []
    for s in range(nz):
        ref_centers = _reference_centers(det_or[s], config, axis=1,
                                         threshold=model.threshold,
                                         row_step=row_step)
        le, lw, mc = _edge_stats_trials(rows[:, s], config, axis=1,
                                        threshold=model.threshold,
                                        row_step=1, ref_centers=ref_centers)
        stats = _aggregate_edge_stats(le, lw, mc)
        pad_ref = np.pad(det_or[s] > model.threshold,
                         ((0, 0), (1, 1))).astype(np.int8)
        ref_runs = (np.diff(pad_ref, axis=1) == 1).sum(axis=1)
        live = ref_runs > 0
        if live.any():
            cells = int(live.sum()) * trials
            stats["break_rate"] = float(
                (runs[:, s][:, live] > ref_runs[None, live]).sum()) / cells
            stats["bridge_rate"] = float(
                (runs[:, s][:, live] < ref_runs[None, live]).sum()) / cells
        else:
            stats["break_rate"] = stats["bridge_rate"] = 0.0
        stats["depth_nm"] = s * float(dz_nm)
        slabs.append(stats)

    prob = band / trials
    if axis == 0:
        prob = prob.transpose(0, 2, 1)
    return {
        "trials": trials,
        "nz": nz,
        "dz_nm": float(dz_nm),
        "slabs": slabs,
        "ler_top_nm": slabs[0]["ler_nm"],
        "ler_bottom_nm": slabs[-1]["ler_nm"],
        "bridge_rate_bottom": slabs[-1]["bridge_rate"],
        "print_probability": prob.astype(np.float32),
    }


def _reference_centers(ref_field: np.ndarray, config: OpticsConfig, *,
                       axis: int, threshold: float,
                       row_step: int) -> np.ndarray | None:
    """Sorted feature-center anchors from the NOISE-FREE deterministic
    field: cluster its run centers at gaps > max(median width, 2 px).
    Trial runs then track the nearest anchor — rounding trial centers by a
    pitch estimate occasionally merges neighboring features when noise
    pushes a run across a bin boundary, producing pitch-scale LER
    outliers; anchoring to the deterministic features cannot."""
    from .resist import feature_table

    feats = feature_table(ref_field, config, axis=axis, threshold=threshold,
                          row_step=row_step)
    centers = np.sort(np.asarray(feats["center_nm"], np.float64))
    if centers.size == 0:
        return None
    gap = max(float(np.median(feats["width_nm"])), 2.0 * config.pixel_size)
    splits = np.nonzero(np.diff(centers) > gap)[0] + 1
    return np.asarray([c.mean() for c in np.split(centers, splits)])


def _edge_stats_trials(fields: np.ndarray, config: OpticsConfig, *,
                       axis: int = 1, threshold: float = 0.5,
                       row_step: int = 1, ref_centers=None):
    """Per-trial (ler, lwr, mean_cd) lists — the streamable half of
    :func:`_edge_stats`."""
    from .resist import feature_table

    px = config.pixel_size
    lers, lwrs, mean_cds = [], [], []
    for contour in fields:
        feats = feature_table(contour, config, axis=axis,
                              threshold=threshold, row_step=row_step)
        if len(feats["row"]) == 0:
            lers.append(np.nan), lwrs.append(np.nan), mean_cds.append(0.0)
            continue
        rise = feats["rise_px"] * px
        fall = feats["fall_px"] * px
        width = feats["width_nm"]
        fid = _assign_feature_ids(feats["center_nm"], width, ref_centers, px)
        ler_vals, lwr_vals = [], []
        for f in np.unique(fid):
            sel = fid == f
            if sel.sum() < max(4, contour.shape[0] // row_step // 8):
                continue  # fragment, not a tracked feature
            ler_vals.append(3.0 * np.std(rise[sel]))
            ler_vals.append(3.0 * np.std(fall[sel]))
            lwr_vals.append(3.0 * np.std(width[sel]))
        lers.append(np.mean(ler_vals) if ler_vals else np.nan)
        lwrs.append(np.mean(lwr_vals) if lwr_vals else np.nan)
        mean_cds.append(float(np.mean(width)))
    return lers, lwrs, mean_cds


def _aggregate_edge_stats(lers, lwrs, mean_cds) -> dict:
    return {
        "ler_nm": float(np.nanmean(lers)),
        "lwr_nm": float(np.nanmean(lwrs)),
        "lcdu_nm": 3.0 * float(np.nanstd(mean_cds)),
        "mean_cd_nm": float(np.nanmean(mean_cds)),
    }


def _edge_stats(fields: np.ndarray, config: OpticsConfig, *,
                axis: int = 1, threshold: float = 0.5,
                row_step: int = 1, ref_centers=None) -> dict:
    """Per-trial subpixel edge statistics via feature_table: LER (3-sigma of
    each edge's position along the feature), LWR (3-sigma of local widths),
    and per-trial mean CD (for LCDU across trials). Run on the CONTINUOUS
    deprotection fields — threshold crossings interpolate to subpixel there,
    while binary contours quantize edges to the pixel grid and hide
    sub-pixel roughness entirely."""
    return _aggregate_edge_stats(*_edge_stats_trials(
        fields, config, axis=axis, threshold=threshold, row_step=row_step,
        ref_centers=ref_centers))


def _defect_counts(contours: np.ndarray, reference: np.ndarray,
                   axis: int = 1) -> tuple[int, int, int]:
    """(broken, bridged, live) cut-line cell counts vs the deterministic
    contour: a cut with MORE above-threshold runs than the reference has a
    broken feature (extra edge pair), FEWER means features merged
    (bridged). Streamable — callers accumulate across trial chunks."""
    if axis == 0:
        contours = contours.transpose(0, 2, 1)
        reference = reference.T

    def runs_per_row(c):
        d = np.diff(np.pad(c > 0.5, ((0, 0), (1, 1))).astype(np.int8), axis=1)
        return (d == 1).sum(axis=1)

    ref_runs = runs_per_row(reference)
    trial_runs = np.stack([runs_per_row(c) for c in contours])
    live = ref_runs > 0
    if not live.any():
        return 0, 0, 0
    broken = int((trial_runs[:, live] > ref_runs[None, live]).sum())
    bridged = int((trial_runs[:, live] < ref_runs[None, live]).sum())
    return broken, bridged, int(live.sum()) * len(contours)


def _defect_rates(contours: np.ndarray, reference: np.ndarray,
                  axis: int = 1) -> dict:
    """Bridge/break rates (see :func:`_defect_counts`)."""
    b, g, lc = _defect_counts(contours, reference, axis=axis)
    return {"break_rate": b / lc if lc else 0.0,
            "bridge_rate": g / lc if lc else 0.0}


def stochastic_ensemble(image, config: OpticsConfig,
                        model: StochasticResist | None = None, *,
                        trials: int = 64, seed: int = 0,
                        axis: int = 1, row_step: int | None = None,
                        trial_chunk: int = 16, psd: bool = False) -> dict:
    """Monte-Carlo stochastic printing summary for one aerial image.

    Returns LER/LWR (nm, 3-sigma), LCDU across trials (nm, 3-sigma),
    bridge/break defect rates vs the deterministic contour, the mean
    contour (printing probability per pixel, the 'stochastic band'), and
    the trial count.

    ``psd=True`` additionally accumulates the averaged edge PSD from the
    SAME streamed trial rows the summary consumes (result key ``"psd"``, a
    :func:`stochastic_psd`-shaped dict) — zero extra trials or transfers,
    where a separate :func:`stochastic_psd` call would re-dispatch the
    whole ensemble (ADVICE r3). The PSD's frequency ceiling follows this
    function's ``row_step``; call :func:`stochastic_psd` directly for a
    denser dedicated sampling."""
    model = model or StochasticResist()
    n = np.asarray(image).shape[0]
    if row_step is None:
        row_step = max(1, n // 512)  # cap full-chip cut lines at ~512
    # Stream trials through the host in bounded chunks: a full-chip
    # ensemble must never materialize (trials, n, n) at once (32 trials at
    # 8192^2 f32 is 8 GB). Chunks use independent seeds — statistically
    # equivalent to one split.
    bytes_per_trial = (-(-n // row_step)) * n * 4 + n * n // 2
    host_chunk = max(1, min(trials,
                            _HOST_FIELD_BYTES // max(bytes_per_trial, 1)))
    # under jit: the FFT blur is complex math, which the TPU tunnel only
    # supports inside compiled programs (CLAUDE.md)
    det_field = np.asarray(jax.jit(
        lambda im: model.deterministic_field(im, config))(jnp.asarray(image)))
    reference = (det_field > model.threshold).astype(np.float32)
    ref_centers = _reference_centers(det_field, config, axis=axis,
                                     threshold=model.threshold,
                                     row_step=row_step)
    ref_oriented = reference if axis == 1 else reference.T
    pad_ref = np.pad(ref_oriented > 0.5, ((0, 0), (1, 1))).astype(np.int8)
    ref_runs = (np.diff(pad_ref, axis=1) == 1).sum(axis=1)
    live = ref_runs > 0
    if psd:
        psd_spacing = config.pixel_size * row_step
        det_rows_psd = (det_field if axis == 1 else det_field.T)[::row_step]
        psd_band = _print_band(det_rows_psd, config,
                               threshold=model.threshold,
                               ref_centers=ref_centers)
        psd_rows = (det_rows_psd.shape[0] if psd_band is None
                    else psd_band[1] - psd_band[0] + 1)
        psd_sum = None
        psd_edges = 0
    lers, lwrs, mean_cds = [], [], []
    prob_sum = np.zeros((n, n), np.float64)
    broken = bridged = live_cells = 0
    for ci, start in enumerate(range(0, trials, host_chunk)):
        m_tr = min(host_chunk, trials - start)
        # device-side summary: sampled continuous cut lines + per-cut run
        # counts + summed contour — ~5x less tunnel transfer than full
        # (m_tr, n, n) fields
        rows_d, runs_d, band_d = exposure_summary(
            image, config, model, trials=m_tr, seed=seed + 7919 * ci,
            trial_chunk=min(trial_chunk, m_tr), row_step=row_step, axis=axis)
        rows = np.asarray(rows_d)
        runs = np.asarray(runs_d)
        band = np.asarray(band_d)
        le, lw, mc = _edge_stats_trials(rows, config, axis=1,
                                        threshold=model.threshold,
                                        row_step=1,
                                        ref_centers=ref_centers)
        lers += le, ; lwrs += lw, ; mean_cds += mc,
        if psd and psd_rows >= 8:
            part = edge_psd(rows, config, axis=1, threshold=model.threshold,
                            spacing_nm=psd_spacing, ref_centers=ref_centers,
                            fit=False, row_band=psd_band)
            if part["n_edges"]:
                add = part["psd_nm3"] * part["n_edges"]
                psd_sum = add if psd_sum is None else psd_sum + add
                psd_edges += part["n_edges"]
        prob_sum += band if axis == 1 else band.T
        if live.any():
            broken += int((runs[:, live] > ref_runs[None, live]).sum())
            bridged += int((runs[:, live] < ref_runs[None, live]).sum())
            live_cells += int(live.sum()) * m_tr
        del rows_d, runs_d, band_d, rows, runs, band
    lers = np.concatenate(lers); lwrs = np.concatenate(lwrs)
    mean_cds = np.concatenate(mean_cds)
    out = _aggregate_edge_stats(lers, lwrs, mean_cds)
    out["break_rate"] = broken / live_cells if live_cells else 0.0
    out["bridge_rate"] = bridged / live_cells if live_cells else 0.0
    out["trials"] = trials
    out["print_probability"] = (prob_sum / trials).astype(np.float32)
    out["deterministic_cd_nm"] = _edge_stats(
        det_field[None], config, axis=axis, threshold=model.threshold,
        row_step=row_step)["mean_cd_nm"]
    if psd:
        spec = _psd_summary(psd_sum, psd_edges, max(psd_rows, 2),
                            psd_spacing, fit=True)
        spec["trials"] = trials
        out["psd"] = spec
    return out


def _assign_feature_ids(center_nm, width_nm, ref_centers, px):
    """Feature id per table entry: nearest deterministic anchor when
    anchors exist, else rounded-center grouping by a pitch estimate
    (shared by the LER/LWR statistics and the PSD trace extraction)."""
    if ref_centers is not None and ref_centers.size:
        if len(ref_centers) > 1:
            idx = np.clip(np.searchsorted(ref_centers, center_nm),
                          1, len(ref_centers) - 1)
            lo = np.maximum(idx - 1, 0)
            return np.where(
                np.abs(ref_centers[idx] - center_nm)
                <= np.abs(ref_centers[lo] - center_nm), idx, lo)
        return np.zeros(len(center_nm), np.int64)
    pitch = max(float(np.median(width_nm)) * 2.0, px)
    return np.round(center_nm / pitch).astype(np.int64)


def _complete_edge_traces(contour, config, *, threshold, ref_centers):
    """Rise/fall edge-position traces (nm, one value per cut line) for
    every feature that prints on EVERY cut line of ``contour`` (R, n).
    A feature missing from any cut line cannot give a uniformly sampled
    trace and is skipped; a cut line with several runs anchored to the
    same feature (a noise-split edge, a spurious sliver) contributes the
    run closest to the feature's anchor center — one extra crossing in
    hundreds of rows must not discard the whole trace."""
    from .resist import feature_table

    px = config.pixel_size
    rows_total = contour.shape[0]
    feats = feature_table(contour, config, axis=1, threshold=threshold,
                          row_step=1)
    if len(feats["row"]) == 0:
        return []
    fid = _assign_feature_ids(feats["center_nm"], feats["width_nm"],
                              ref_centers, px)
    traces = []
    for f in np.unique(fid):
        sel = fid == f
        rows = feats["row"][sel]
        if len(np.unique(rows)) != rows_total:
            continue
        centers = feats["center_nm"][sel]
        anchor = np.median(centers)
        # sort by (row, distance-to-anchor); keep the first run per row
        order = np.lexsort((np.abs(centers - anchor), rows))
        keep = order[np.concatenate(
            ([True], rows[order][1:] != rows[order][:-1]))]
        traces.append(feats["rise_px"][sel][keep] * px)
        traces.append(feats["fall_px"][sel][keep] * px)
    return traces


def _print_band(det_rows, config, *, threshold, ref_centers):
    """Longest contiguous cut-line interval [lo, hi] over which the
    deterministic field prints its maximal anchor count. Real images roll
    off at the field edge (and line ends), so demanding full-height traces
    finds none; PSD traces must be uniformly sampled, so the analysis
    restricts to this band instead."""
    from .resist import feature_table

    feats = feature_table(det_rows, config, axis=1, threshold=threshold,
                          row_step=1)
    if len(feats["row"]) == 0:
        return None
    fid = _assign_feature_ids(feats["center_nm"], feats["width_nm"],
                              ref_centers, config.pixel_size)
    n_rows = det_rows.shape[0]
    anchors = np.unique(fid)
    cover = np.zeros((len(anchors), n_rows), bool)
    for i, u in enumerate(anchors):
        cover[i, np.unique(feats["row"][fid == u])] = True
    count = cover.sum(axis=0)
    good = np.concatenate(([0], (count == count.max()).astype(np.int8), [0]))
    d = np.diff(good)
    starts, ends = np.nonzero(d == 1)[0], np.nonzero(d == -1)[0]
    k = int(np.argmax(ends - starts))
    return int(starts[k]), int(ends[k] - 1)


def edge_psd(fields, config, *, axis=1, threshold=0.5, spacing_nm=None,
             ref_centers=None, fit=True, row_band=None):
    """Averaged one-sided LER power spectral density of a trial ensemble.

    ``fields`` is (T, R, n): T trials of R uniformly spaced continuous
    cut lines (what :func:`exposure_summary` returns), or full (T, n, n)
    fields with ``axis`` selecting the cut direction. Every feature that
    prints on all analyzed cut lines contributes its rise and fall edge
    traces; ``row_band=(lo, hi)`` restricts the analysis to a contiguous
    cut-line interval (see :func:`_print_band` — field edges and line
    ends don't print, and would otherwise veto every trace).

    PSD convention (Mack, J. Micro/Nanolith. MEMS MOEMS 12(3), 2013): for
    edge positions x_i (nm) sampled at spacing d (nm), the one-sided
    estimate is PSD_k = 2 d |DFT(x - mean)|_k^2 / N at f_k = k/(N d), so
    sum_k PSD_k * df = Var(x). Units nm^3; DC is dropped (mean-detrended).

    Returns freq_per_nm (R//2,), psd_nm3 (averaged over edges), n_edges,
    sigma_nm / ler_3s_nm (Parseval), and — with ``fit=True`` — the
    Palasantzas model parameters from :func:`fit_psd_model`.
    """
    fields = np.asarray(fields)
    if axis == 0:
        fields = fields.transpose(0, 2, 1)
    if row_band is not None:
        fields = fields[:, row_band[0]:row_band[1] + 1]
    spacing = float(spacing_nm or config.pixel_size)
    n_rows = fields.shape[1]
    if n_rows < 8:
        raise ValueError(f"need >= 8 cut lines for a PSD, got {n_rows}")
    psd_sum = np.zeros(n_rows // 2, np.float64)
    n_edges = 0
    for contour in fields:
        for trace in _complete_edge_traces(
                contour, config, threshold=threshold,
                ref_centers=ref_centers):
            x = trace - trace.mean()
            spec = np.abs(np.fft.rfft(x)[1:n_rows // 2 + 1]) ** 2
            psd = 2.0 * spacing * spec / n_rows
            if n_rows % 2 == 0:
                psd[-1] *= 0.5  # Nyquist bin is not duplicated
            psd_sum += psd
            n_edges += 1
    out = {
        "freq_per_nm": np.fft.rfftfreq(n_rows, d=spacing)[1:n_rows // 2 + 1],
        "n_edges": n_edges,
        "spacing_nm": spacing,
    }
    if n_edges == 0:
        out["psd_nm3"] = psd_sum
        out["sigma_nm"] = out["ler_3s_nm"] = float("nan")
        return out
    psd = psd_sum / n_edges
    df = 1.0 / (n_rows * spacing)
    sigma = math.sqrt(float(psd.sum() * df))
    out["psd_nm3"] = psd
    out["sigma_nm"] = sigma
    out["ler_3s_nm"] = 3.0 * sigma
    out["acf_corr_length_nm"] = acf_correlation_length(
        out["freq_per_nm"], psd, spacing)
    if fit:
        out.update(_fit_or_nan(out["freq_per_nm"], psd))
    return out


_NAN_FIT = {"corr_length_nm": float("nan"), "alpha": float("nan"),
            "psd0_nm3": float("nan"), "model_sigma_nm": float("nan"),
            "fit_rms_log": float("nan")}


def _fit_or_nan(freq_per_nm, psd_nm3) -> dict:
    """Palasantzas fit, degenerate-safe: a near-zero-noise ensemble whose
    averaged PSD has < 4 positive samples gets NaN parameters instead of a
    ValueError crashing the run after the trials already completed
    (ADVICE r3)."""
    try:
        return fit_psd_model(freq_per_nm, psd_nm3)
    except ValueError:
        return dict(_NAN_FIT)


def acf_correlation_length(freq_per_nm, psd_nm3, spacing_nm):
    """Model-free correlation length: the lag where the edge autocorrelation
    (Wiener-Khinchin transform of the one-sided PSD) first drops below 1/e,
    linearly interpolated. Robust for spectra the Palasantzas power law
    fits poorly (e.g. the Gaussian-like rolloff of diffusion-smoothed
    resist edges)."""
    f = np.asarray(freq_per_nm, np.float64)
    p = np.asarray(psd_nm3, np.float64)
    var = p.sum()
    if not var > 0:
        return float("nan")
    lags = spacing_nm * np.arange(len(f) + 1)
    acf = (p[None, :] * np.cos(2.0 * np.pi * lags[:, None] * f[None, :])
           ).sum(axis=1) / var
    target = 1.0 / math.e
    below = np.nonzero(acf < target)[0]
    if below.size == 0:
        return float(lags[-1])  # never decorrelates over the trace
    j = below[0]
    if j == 0:
        return 0.0
    frac = (acf[j - 1] - target) / max(acf[j - 1] - acf[j], 1e-30)
    return float(lags[j - 1] + frac * spacing_nm)


def fit_psd_model(freq_per_nm, psd_nm3):
    """Palasantzas LER model fit:
    PSD(f) = P0 / (1 + (2 pi f xi)^2)^(alpha + 1/2).

    For a fixed correlation length xi the log model is linear in
    (log P0, alpha), so the fit is a 1-D search over xi with a
    closed-form least-squares solve per candidate — no iterative
    optimizer. Returns corr_length_nm (xi), alpha (roughness exponent),
    psd0_nm3 (P0), model_sigma_nm (the closed-form integral of the
    fitted model, valid for alpha > 0) and the log-space RMS residual.
    """
    f = np.asarray(freq_per_nm, np.float64)
    p = np.asarray(psd_nm3, np.float64)
    keep = p > 0
    f, p = f[keep], p[keep]
    if f.size < 4:
        raise ValueError("need >= 4 positive PSD samples to fit")
    logp = np.log(p)

    def _grid_fit(fv, lv):
        best = None
        # xi between a tenth of the shortest and 10x the longest resolvable
        # wavelength; log-spaced (the residual is smooth in log xi)
        for xi in np.geomspace(0.1 / fv[-1], 10.0 / fv[0], 96):
            u = np.log1p((2.0 * np.pi * fv * xi) ** 2)
            basis = np.stack([np.ones_like(u), -u], axis=1)
            sol, *_ = np.linalg.lstsq(basis, lv, rcond=None)
            resid = lv - basis @ sol
            rms = float(np.sqrt(np.mean(resid ** 2)))
            if best is None or rms < best[0]:
                best = (rms, xi, sol, resid)
        return best

    rms, xi, sol, resid = _grid_fit(f, logp)
    # one trimmed refit: a few near-zero bins (windowing artifacts, an
    # unsampled Nyquist) are huge log-space outliers that drag the slope
    keep2 = np.abs(resid) <= 3.0 * max(rms, 1e-12)
    if keep2.sum() >= 4 and not keep2.all():
        rms, xi, sol, _ = _grid_fit(f[keep2], logp[keep2])
    logp0, slope = sol
    alpha = float(slope - 0.5)
    p0 = float(np.exp(logp0))
    if alpha > 0:
        model_sigma = math.sqrt(
            p0 * math.sqrt(math.pi) * math.gamma(alpha)
            / (4.0 * math.pi * xi * math.gamma(alpha + 0.5)))
    else:  # integral diverges; report NaN rather than a fake number
        model_sigma = float("nan")
    return {
        "corr_length_nm": float(xi),
        "alpha": alpha,
        "psd0_nm3": p0,
        "model_sigma_nm": model_sigma,
        "fit_rms_log": rms,
    }


def _psd_summary(psd_sum, n_edges: int, n_rows: int, spacing: float, *,
                 fit: bool) -> dict:
    """Assemble the averaged-PSD result dict from accumulated per-chunk
    partials (shared by :func:`stochastic_psd` and the in-pass accumulation
    of :func:`stochastic_ensemble`). ``n_edges == 0`` — including the
    too-narrow-band case that never accumulated — yields the NaN result
    rather than raising."""
    out = {
        "freq_per_nm": np.fft.rfftfreq(n_rows, d=spacing)[1:n_rows // 2 + 1],
        "n_edges": n_edges,
        "spacing_nm": spacing,
    }
    if n_edges == 0:
        out["psd_nm3"] = np.zeros(n_rows // 2)
        out["sigma_nm"] = out["ler_3s_nm"] = float("nan")
        if fit:
            out.update(_NAN_FIT)
        return out
    psd = psd_sum / n_edges
    df = 1.0 / (n_rows * spacing)
    sigma = math.sqrt(float(psd.sum() * df))
    out["psd_nm3"] = psd
    out["sigma_nm"] = sigma
    out["ler_3s_nm"] = 3.0 * sigma
    out["acf_corr_length_nm"] = acf_correlation_length(
        out["freq_per_nm"], psd, spacing)
    if fit:
        out.update(_fit_or_nan(out["freq_per_nm"], psd))
    return out


def stochastic_psd(image, config, model=None, *, trials=64,
                   seed=0, axis=1, row_step=1, trial_chunk=16,
                   fit=True):
    """LER PSD + Palasantzas parameters for one aerial image.

    Runs the transfer-lean device trial summary (:func:`exposure_summary`)
    in host-bounded chunks — the same streaming scheme as
    :func:`stochastic_ensemble` — and accumulates the averaged edge PSD
    across all trials. ``row_step`` keeps full-chip calls bounded but
    coarsens the highest resolvable frequency (1 / (2 row_step px)); the
    default samples every cut line, which is what a PSD wants.
    """
    model = model or StochasticResist()
    n = np.asarray(image).shape[0]
    bytes_per_trial = (-(-n // row_step)) * n * 4 + n * n // 2
    host_chunk = max(1, min(trials,
                            _HOST_FIELD_BYTES // max(bytes_per_trial, 1)))
    det_field = np.asarray(jax.jit(
        lambda im: model.deterministic_field(im, config))(jnp.asarray(image)))
    ref_centers = _reference_centers(det_field, config, axis=axis,
                                     threshold=model.threshold,
                                     row_step=row_step)
    spacing = config.pixel_size * row_step
    det_rows = (det_field if axis == 1 else det_field.T)[::row_step]
    band = _print_band(det_rows, config, threshold=model.threshold,
                       ref_centers=ref_centers)
    n_rows = det_rows.shape[0] if band is None else band[1] - band[0] + 1
    if n_rows < 8:
        # a print band under 8 cut lines (short lines, contacts, coarse
        # row_step) cannot support a PSD: return the n_edges=0 NaN result
        # instead of letting edge_psd raise mid-run (ADVICE r3)
        out = _psd_summary(None, 0, max(n_rows, 2), spacing, fit=fit)
        out["trials"] = trials
        return out
    psd_sum = None
    n_edges = 0
    for ci, start in enumerate(range(0, trials, host_chunk)):
        m_tr = min(host_chunk, trials - start)
        rows_d, _, _ = exposure_summary(
            image, config, model, trials=m_tr, seed=seed + 7919 * ci,
            trial_chunk=min(trial_chunk, m_tr), row_step=row_step, axis=axis)
        part = edge_psd(np.asarray(rows_d), config, axis=1,
                        threshold=model.threshold, spacing_nm=spacing,
                        ref_centers=ref_centers, fit=False, row_band=band)
        del rows_d
        if part["n_edges"]:
            add = part["psd_nm3"] * part["n_edges"]
            psd_sum = add if psd_sum is None else psd_sum + add
            n_edges += part["n_edges"]
    out = _psd_summary(psd_sum, n_edges, n_rows, spacing, fit=fit)
    out["trials"] = trials
    return out

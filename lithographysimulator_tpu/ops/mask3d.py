"""Thick-mask (Mask-3D) effects: the boundary-layer model.

The reference (and this framework's default path) treats the mask as an
infinitely thin Kirchhoff screen — transmission is the drawn layout
(``/root/reference/mask.py:42-59`` builds the spectrum straight from the
geometry). Real masks are ~70 nm of absorber on glass: near feature edges
the field is perturbed by the topography, which at hyper-NA shows up as
orientation-dependent CD bias (H-V bias), pattern-shift, and a best-focus
shift that the thin-mask model cannot produce.

The industry-standard cheap correction is the *boundary layer* (BL) model
(Tirapu-Azpiroz & Yablonovitch, JOSA A 23, 2006): augment the thin-mask
transmission with thin strips of complex transmission along every feature
edge, with different strip parameters for horizontal and vertical edges.
Rigorous solvers (FDTD/RCWA) are used once to fit the strip width and
complex amplitude; imaging then stays fully Fourier-optical.

TPU-native formulation: on an n x n transmission grid with pixel size p, a
strip of physical width w and added complex amplitude beta along an edge is
an added field of ``beta * (w / p)`` on the edge pixels. Edge positions and
strengths come from first differences of the (possibly complex) geometry —
pure elementwise/roll work that fuses into the surrounding spectrum FFT, is
exactly zero away from edges, and is differentiable w.r.t. both the mask
and the BL parameters. The model is therefore usable in three ways:

- forward: ``apply_boundary_layers`` -> effective complex mask, consumed by
  every imaging path (Abbe / SOCS / vector / tiled) unchanged;
- inverse: SMO/OPC *through* the BL model corrects the layout for thick-
  mask effects (M3D-aware OPC);
- calibration: :func:`fit_boundary_layer` recovers (beta_h, beta_v) from a
  reference aerial image by gradient descent (the analog of
  :func:`..optimize.fit_aberrations` for the mask stack).

Edge-orientation convention: a VERTICAL edge runs along the row axis
(transmission changes along axis 1); ``beta_v`` scales vertical-edge
strips, ``beta_h`` horizontal-edge strips. ``beta_h == beta_v`` recovers an
isotropic model; ``width_nm == 0`` or ``beta == 0`` recovers thin-mask
exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import OpticsConfig

_EPS = 1e-20  # smooths |diff| at exactly-flat regions so mask grads stay finite


@dataclasses.dataclass(frozen=True)
class BoundaryLayer:
    """Static BL parameters (hashable: usable as a jit-static cache key).

    width_nm: physical strip width (per edge side, total added amplitude per
        unit edge length is ``beta * width_nm``).
    beta_h / beta_v: complex added transmission of horizontal- / vertical-
        edge strips. Real part biases CD; imaginary part produces the
        thick-mask best-focus shift and pattern asymmetry through focus.
    """

    width_nm: float = 8.0
    beta_h: complex = 0.0
    beta_v: complex = 0.0
    # oblique-incidence (EUV chief-ray shadowing) asymmetry: rising /
    # falling edges carry beta +- asym (see edge_fields_signed) — the
    # mechanism behind the thick-mask pattern shift. 0 = symmetric model.
    beta_h_asym: complex = 0.0
    beta_v_asym: complex = 0.0

    def apply(self, geometry: jnp.ndarray, config: OpticsConfig) -> jnp.ndarray:
        return apply_boundary_layers(
            geometry, config,
            width_nm=self.width_nm, beta_h=self.beta_h, beta_v=self.beta_v,
            beta_h_asym=self.beta_h_asym, beta_v_asym=self.beta_v_asym)


def _safe_abs(d: jnp.ndarray) -> jnp.ndarray:
    if jnp.issubdtype(d.dtype, jnp.complexfloating):
        return jnp.sqrt(d.real**2 + d.imag**2 + _EPS)
    return jnp.sqrt(d * d + _EPS)


def edge_fields(geometry: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(E_h, E_v) edge-strength maps: each unit transmission step contributes
    total weight 1 per edge, split 1/2-1/2 onto the two pixels flanking it.

    Works on continuous (SMO/OPC sigmoid) and complex (PSM) masks alike —
    strengths are |first difference| magnitudes. Periodic (roll) boundary
    handling matches the FFT spectrum's own periodicity; on the tiled path
    the wraparound pixels land in the discarded halo.
    """
    g = jnp.asarray(geometry)
    d0 = _safe_abs(g - jnp.roll(g, 1, axis=0))  # steps along rows
    d1 = _safe_abs(g - jnp.roll(g, 1, axis=1))  # steps along columns
    e_h = 0.5 * (d0 + jnp.roll(d0, -1, axis=0))
    e_v = 0.5 * (d1 + jnp.roll(d1, -1, axis=1))
    return e_h, e_v


def edge_fields_signed(
    geometry: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """:func:`edge_fields` split by step direction: ``(E_h_rise, E_h_fall,
    E_v_rise, E_v_fall)`` where *rise* means transmission MAGNITUDE
    increasing along the +axis direction (dark-to-bright going down/right).
    ``rise + fall`` recovers :func:`edge_fields` (to 1 ulp). The split is
    what oblique-incidence (EUV chief-ray) shadowing physics needs: the
    illuminated and shadowed sides of a feature are different edges, so
    their boundary strips carry different amplitudes — which is exactly a
    pattern shift, the signature thick-mask EUV effect. Phase-only steps
    (alternating PSM) have no magnitude direction and split evenly."""
    g = jnp.asarray(geometry)
    mag = _safe_abs(g) if jnp.issubdtype(g.dtype, jnp.complexfloating) else g
    d0 = _safe_abs(g - jnp.roll(g, 1, axis=0))
    d1 = _safe_abs(g - jnp.roll(g, 1, axis=1))
    s0 = mag - jnp.roll(mag, 1, axis=0)
    s1 = mag - jnp.roll(mag, 1, axis=1)
    rise0, fall0 = 0.5 * (d0 + s0), 0.5 * (d0 - s0)
    rise1, fall1 = 0.5 * (d1 + s1), 0.5 * (d1 - s1)

    def split(d, axis):
        return 0.5 * (d + jnp.roll(d, -1, axis=axis))

    return split(rise0, 0), split(fall0, 0), split(rise1, 1), split(fall1, 1)


def _static_zero(beta) -> bool:
    """True only for a literal Python zero (not a traced value)."""
    return isinstance(beta, (int, float, complex)) and complex(beta) == 0.0


def apply_boundary_layers(
    geometry: jnp.ndarray,
    config: OpticsConfig,
    *,
    width_nm,
    beta_h,
    beta_v,
    beta_h_asym=0.0,
    beta_v_asym=0.0,
) -> jnp.ndarray:
    """Effective complex transmission with BL strips added along edges.

    ``width_nm`` / ``beta_h`` / ``beta_v`` may be Python scalars (static,
    the common forward path) or traced JAX scalars (the calibration path
    differentiates through them). Complex arithmetic — run under jit on the
    TPU tunnel (CLAUDE.md), as all callers here do.
    """
    g = jnp.asarray(geometry)
    scale = jnp.asarray(width_nm, jnp.float32) / jnp.float32(config.pixel_size)
    if _static_zero(beta_h_asym) and _static_zero(beta_v_asym):
        # symmetric model (the common path — unchanged arithmetic)
        e_h, e_v = edge_fields(g)
        pert = scale * (jnp.asarray(beta_h, jnp.complex64) * e_h
                        + jnp.asarray(beta_v, jnp.complex64) * e_v)
        return g.astype(jnp.complex64) + pert
    # asymmetric model (oblique-incidence shadowing): rising and falling
    # edges carry beta +- asym respectively
    e_hr, e_hf, e_vr, e_vf = edge_fields_signed(g)
    bh = jnp.asarray(beta_h, jnp.complex64)
    bv = jnp.asarray(beta_v, jnp.complex64)
    bha = jnp.asarray(beta_h_asym, jnp.complex64)
    bva = jnp.asarray(beta_v_asym, jnp.complex64)
    pert = scale * ((bh + bha) * e_hr + (bh - bha) * e_hf
                    + (bv + bva) * e_vr + (bv - bva) * e_vf)
    return g.astype(jnp.complex64) + pert


def fit_boundary_layer(
    target_image: jnp.ndarray,
    geometry,
    shifts,
    weights,
    config: OpticsConfig,
    *,
    width_nm: float = 8.0,
    solver: str = "gau23",
    chunk: int = 8,
    steps: int = 200,
    learning_rate: float = 0.02,
    aberrations=None,
    fit_asym: bool = False,
) -> tuple[BoundaryLayer, list[float]]:
    """Calibrate (beta_h, beta_v) against a reference aerial image.
    ``fit_asym=True`` additionally fits the rising/falling edge asymmetry
    (beta_h_asym, beta_v_asym) — needed when the reference image carries an
    oblique-incidence pattern shift (EUV chief-ray shadowing).

    The reference image typically comes from a rigorous EMF solver or
    measurement; this fits the 4 real BL degrees of freedom by Adam on the
    normalized-image MSE, through the full differentiable imaging stack.
    Strip width is held fixed (width and |beta| are nearly degenerate to
    first order — fit beta at a plausible width instead of both).

    Returns the fitted :class:`BoundaryLayer` and the loss history.
    """
    import optax

    from ..models.pupil import pupil_function
    from .abbe import abbe_image_points
    from .fraunhofer import mask_spectrum

    if aberrations is None:
        aberrations = jnp.zeros((1,), jnp.float32)
    aberrations = jnp.asarray(aberrations, jnp.float32)
    geometry = jnp.asarray(geometry)
    target = jnp.asarray(target_image, jnp.float32)
    target = target / jnp.maximum(jnp.max(target), 1e-30)

    optimizer = optax.adam(learning_rate)

    @jax.jit
    def step(params, opt_state, geometry, target, aberrations, shifts, weights):
        def loss_fn(p):
            beta_h = jax.lax.complex(p["bh_re"], p["bh_im"])
            beta_v = jax.lax.complex(p["bv_re"], p["bv_im"])
            asym = ({"beta_h_asym": jax.lax.complex(p["ah_re"], p["ah_im"]),
                     "beta_v_asym": jax.lax.complex(p["av_re"], p["av_im"])}
                    if "ah_re" in p else {})
            eff = apply_boundary_layers(geometry, config, width_nm=width_nm,
                                        beta_h=beta_h, beta_v=beta_v, **asym)
            spectrum = mask_spectrum(eff, config, solver=solver)
            pupil = pupil_function(aberrations, config)
            image = abbe_image_points(spectrum, pupil, shifts, weights,
                                      config, solver=solver, chunk=chunk,
                                      normalize=True)
            image = image / jnp.maximum(jnp.max(image), 1e-30)
            return jnp.mean((image - target) ** 2)

        value, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, value

    keys = ["bh_re", "bh_im", "bv_re", "bv_im"]
    if fit_asym:
        keys += ["ah_re", "ah_im", "av_re", "av_im"]
    params = {k: jnp.float32(0.0) for k in keys}
    opt_state = optimizer.init(params)
    history: list[float] = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, geometry, target,
                                       aberrations, jnp.asarray(shifts),
                                       jnp.asarray(weights))
        history.append(float(loss))
    fitted = BoundaryLayer(
        width_nm=width_nm,
        beta_h=complex(float(params["bh_re"]), float(params["bh_im"])),
        beta_v=complex(float(params["bv_re"]), float(params["bv_im"])),
        beta_h_asym=(complex(float(params["ah_re"]), float(params["ah_im"]))
                     if fit_asym else 0.0),
        beta_v_asym=(complex(float(params["av_re"]), float(params["av_im"]))
                     if fit_asym else 0.0),
    )
    return fitted, history


def grating_geometry(config: OpticsConfig, *, pitch_px: int, duty: float,
                     transmission: complex = 0.0, axis: int = 1):
    """Drawn thin-mask line/space layout matching the centering convention of
    :func:`..rcwa.rcwa_effective_mask`: absorber of complex ``transmission``
    covering ``duty`` of each period, centered on x = 0 (periodic wrap).
    ``duty * pitch_px`` should be an ODD pixel count for an exact raster: an
    odd run of pixels centers on x = 0 exactly (pixel i spans i ± 1/2, so a
    width-(2m+1) rect covers pixel centers −m..m with no partial pixels); an
    even count cannot center on a pixel and rasterizes one pixel narrow."""
    import numpy as np

    n = int(config.pixel_number)
    if pitch_px <= 0 or n % int(pitch_px):
        raise ValueError(f"pitch_px={pitch_px} must divide pixel_number={n}")
    x = np.arange(n)
    half = 0.5 * duty * pitch_px
    dist = np.minimum(x % pitch_px, pitch_px - (x % pitch_px))
    row = np.where(dist < half, complex(transmission), 1.0 + 0.0j)
    geom = np.broadcast_to(row[None, :], (n, n))
    if axis == 0:
        geom = geom.T
    if complex(transmission) == 0.0:
        # binary masks stay real float32 (the common fast path)
        return jnp.asarray(np.ascontiguousarray(geom.real), jnp.float32)
    # complex (PSM) layouts upload as re/im planes: complex host->device
    # transfers fail on the TPU tunnel (see .xfer)
    from ..xfer import to_device_complex

    return to_device_complex(np.ascontiguousarray(geom)).astype(jnp.complex64)


def boundary_layer_from_rcwa(
    config: OpticsConfig,
    *,
    stack="binary_cr",
    pitch_px: int = 16,
    duty: float = 7.0 / 16.0,
    illumination_pol: str = "unpolarized",
    width_nm: float = 8.0,
    magnification: float = 4.0,
    n_harmonics: int = 31,
    sigma_out: float = 0.5,
    solver: str = "gau23",
    chunk: int = 8,
    steps: int = 150,
    learning_rate: float = 0.05,
) -> tuple[BoundaryLayer, dict]:
    """Calibrate the BL model from first principles — no external EMF tool.

    Runs the in-repo rigorous RCWA oracle (:mod:`.rcwa`) on a line/space
    topography of the named absorber ``stack``, images the rigorous near
    field through the standard Abbe stack, and fits β by gradient descent
    against that image (one fit per polarization). Polarization mapping for
    lines along y (a VERTICAL edge): E ∥ lines is TE, E ⊥ lines is TM, so

    - ``illumination_pol='x'``: β_v = β_TM, β_h = β_TE;
    - ``illumination_pol='y'``: β_v = β_TE, β_h = β_TM;
    - ``'unpolarized'``: both β fit against the TE/TM-averaged (incoherent)
      image — by rotational symmetry β_h = β_v, and H–V bias vanishes, as
      it physically must for unpolarized illumination at normal incidence.

    Returns the calibrated :class:`BoundaryLayer` and a report dict with the
    per-polarization fits, loss histories, and the rigorous/thin/corrected
    image residuals (nRMS) that certify the fit.

    The default ``duty`` keeps ``duty * pitch_px`` odd so the drawn layout
    rasterizes exactly (see :func:`grating_geometry`) — otherwise a 1-px CD
    mismatch between the thin layout and the RCWA topography leaks into β.

    Caveat: an in-focus target determines Re β (the CD bias) strongly but
    constrains Im β only at second order — its *sign* (the direction of the
    thick-mask best-focus shift) can land either way between runs/backends.
    Fits that need the focus-shift sign should extend the target to a
    through-focus pair (``fit_boundary_layer`` accepts ``aberrations``).
    """
    import numpy as np

    from ..models.mask import Mask, from_array
    from ..models.source import LightSource
    from ..parallel import padded_source_arrays
    from ..simulate import simulate
    from .rcwa import rcwa_effective_mask, thin_mask_transmission

    if illumination_pol not in ("x", "y", "unpolarized"):
        raise ValueError(f"unknown illumination_pol {illumination_pol!r}")

    src = np.asarray(LightSource(config, sigma_out=sigma_out).classical())
    shifts, weights, _ = padded_source_arrays(src, chunk)

    t_thin = thin_mask_transmission(stack, config.wavelength)
    if abs(t_thin) < 0.02:
        t_thin = 0.0  # binary: draw the standard opaque layout
    geom = grating_geometry(config, pitch_px=pitch_px, duty=duty,
                            transmission=t_thin, axis=1)

    def imaged(geometry) -> np.ndarray:
        # host arrays go through from_array (complex uploads as re/im
        # planes — required on the TPU tunnel); device arrays wrap directly
        # (a host round-trip would be a complex readback, which also fails)
        if isinstance(geometry, jax.Array):
            mask = Mask(geometry=geometry, config=config)
        else:
            mask = from_array(geometry, config)
        img = np.asarray(
            simulate(mask, src, solver=solver, normalize=True).image)
        return img / max(float(img.max()), 1e-30)

    thin_img = imaged(geom)
    targets = {}
    for pol in ("te", "tm"):
        rig = rcwa_effective_mask(
            config, pitch_px=pitch_px, duty=duty, stack=stack, pol=pol,
            axis=1, magnification=magnification, n_harmonics=n_harmonics)
        targets[pol] = imaged(rig)

    def nrms(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    fits, report = {}, {"pitch_px": pitch_px, "duty": duty,
                        "thin_nrms": {}, "fit_nrms": {}, "history": {}}
    fit_targets = ({"avg": 0.5 * (targets["te"] + targets["tm"])}
                   if illumination_pol == "unpolarized" else targets)
    for key, target in fit_targets.items():
        bl, hist = fit_boundary_layer(
            target, geom, shifts, weights, config, width_nm=width_nm,
            solver=solver, chunk=chunk, steps=steps,
            learning_rate=learning_rate)
        fits[key] = bl
        # apply under jit: eager complex arithmetic dies on the TPU tunnel
        corrected = imaged(jax.jit(bl.apply, static_argnums=1)(geom, config))
        report["thin_nrms"][key] = nrms(thin_img, target)
        report["fit_nrms"][key] = nrms(corrected, target)
        report["history"][key] = hist

    if illumination_pol == "unpolarized":
        beta = fits["avg"].beta_v
        result = BoundaryLayer(width_nm=width_nm, beta_h=beta, beta_v=beta)
    elif illumination_pol == "x":
        result = BoundaryLayer(width_nm=width_nm,
                               beta_h=fits["te"].beta_v,
                               beta_v=fits["tm"].beta_v)
    else:
        result = BoundaryLayer(width_nm=width_nm,
                               beta_h=fits["tm"].beta_v,
                               beta_v=fits["te"].beta_v)
    report["fits"] = fits
    return result, report

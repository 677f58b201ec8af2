"""End-to-end production flow on a small chip — the framework tour.

Design -> OPC -> mask rule check/repair -> ORC sign-off -> focus-exposure
matrix (process window + NILS + CDU) -> dose-map correction -> stochastic
printability -> printed-contour GDS export. Every step is the same API the
full-chip paths use; sizes here are kept small so the whole flow runs on
CPU in about a minute (scale pixel_number/big_n up on real hardware).

Run: python examples/production_flow.py [--big-n 128] [--out-dir /tmp]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import lithographysimulator_tpu as lt  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big-n", type=int, default=128)
    ap.add_argument("--tile-n", type=int, default=64)
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    out_dir = Path(args.out_dir)

    # -- 1. design + optics --------------------------------------------------
    cfg = lt.OpticsConfig(pixel_number=args.tile_n)
    big_n = args.big_n
    layout = np.zeros((big_n, big_n), np.float32)
    for y in range(16, big_n - 16, 40):
        for x in range(16, big_n - 16, 40):
            layout[y:y + 12, x:x + 20] = 1.0
    source = np.asarray(lt.LightSource(cfg, sigma_out=0.6).annular())
    resist = lt.ResistModel(threshold=0.3, steepness=30.0)

    # -- 2. OPC + MRC repair -------------------------------------------------
    from lithographysimulator_tpu.optimize import opc_correct_tiled

    corrected = opc_correct_tiled(layout, cfg, source, resist=resist,
                                  halo=16, steps=12, rank=48,
                                  learning_rate=0.2)
    rules = lt.MaskRules(min_width_nm=2 * cfg.pixel_size,
                         min_area_nm2=6 * cfg.pixel_size ** 2)
    corrected = lt.mrc_clean(corrected, cfg, rules)
    print("MRC:", json.dumps({k: v for k, v in
                              lt.mrc_check(corrected, cfg, rules).items()
                              if not isinstance(v, np.ndarray)}))

    # -- 3. ORC sign-off -----------------------------------------------------
    deck = lt.orc_check(corrected, layout, cfg, source, resist=resist,
                        rank=48, halo=16, mrc_rules=rules, epe_spec_nm=90.0)
    print("ORC:", json.dumps({"pass": deck["pass_"],
                              "iou": round(deck["fidelity"]["iou"], 3),
                              "mean_nils": round(deck["nils"]["mean_nils"], 2),
                              "epe_max": deck["epe"]["max_abs_epe_nm"]}))

    # -- 4. process window + dose correction ---------------------------------
    fem = lt.tiled_fem(corrected, cfg, source,
                       defocus_nm=[-80.0, 0.0, 80.0],
                       doses=[0.85, 1.0, 1.15], resist=resist,
                       rank=48, halo=16, cd_stat="mean")
    print("FEM:", json.dumps({
        "dof_nm": fem["depth_of_focus_nm"],
        "exposure_latitude": round(fem["exposure_latitude"], 3),
        "cdu_3sigma_nm": round(fem["cdu"]["cdu_3sigma_nm"], 2)}))
    try:
        dc = lt.dose_correction_map(fem)
        print("dose map: sensitivity "
              f"{dc['sensitivity_nm_per_dose']:.1f} nm/dose, "
              f"max residual {dc['predicted_residual_nm']:.2f} nm")
    except ValueError as exc:  # flat CDU: nothing to correct
        print("dose map: skipped:", exc)

    # -- 5. stochastic printability ------------------------------------------
    sto = lt.tiled_stochastic(
        corrected, cfg, source,
        model=lt.StochasticResist(dose_photons_per_nm2=20.0,
                                  diffusion_nm=8.0, threshold=0.3),
        trials=8, rank=48, halo=16)
    print("stochastic:", json.dumps({
        "ler_nm": round(sto["ler_nm"], 2),
        "break_rate": sto["break_rate"],
        "bridge_rate": sto["bridge_rate"]}))

    # -- 6. printed contours back to layout land ------------------------------
    image = lt.tiled_focus_images(corrected, cfg, source, [0.0],
                                  rank=48, halo=16)[0]
    profile = np.asarray(resist.develop_binary(image / image.max(), cfg,
                                               normalize=False))
    gds = out_dir / "printed_contours.gds"
    from lithographysimulator_tpu.io.contours import contours_to_gds

    contours_to_gds(gds, profile, cfg, layer=1)
    np.save(out_dir / "corrected_mask.npy", corrected)
    print(f"wrote {gds} and corrected_mask.npy")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

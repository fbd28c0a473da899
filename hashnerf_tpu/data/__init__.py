from hashnerf_tpu.data.scene import Scene, RayBundle
from hashnerf_tpu.data.synthetic import make_synthetic_scene


def load_scene(dataset_type: str, datadir: str, args) -> "Scene":
    """Dispatch on dataset_type (reference run_nerf.py:210-299)."""
    if dataset_type == "blender":
        from hashnerf_tpu.data.blender import load_blender_scene

        return load_blender_scene(datadir, args.half_res, args.testskip, args.white_bkgd)
    if dataset_type == "llff":
        from hashnerf_tpu.data.llff import load_llff_scene

        return load_llff_scene(
            datadir, args.factor, spherify=args.spherify,
            llffhold=args.llffhold, no_ndc=args.no_ndc,
        )
    if dataset_type == "scannet":
        from hashnerf_tpu.data.scannet import load_scannet_scene

        return load_scannet_scene(datadir, args.scannet_sceneID, args.half_res)
    if dataset_type == "deepvoxels":
        from hashnerf_tpu.data.deepvoxels import load_deepvoxels_scene

        return load_deepvoxels_scene(args.shape, datadir, args.testskip)
    if dataset_type == "LINEMOD":
        from hashnerf_tpu.data.linemod import load_linemod_scene

        return load_linemod_scene(datadir, args.half_res, args.testskip, args.white_bkgd)
    if dataset_type == "synthetic":
        return make_synthetic_scene()
    raise ValueError(f"Unknown dataset type {dataset_type!r}")

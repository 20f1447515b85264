"""Offline preprocessing CLI (preprocess/preprocess_vod.py equivalent):

    python -m cmflow_tpu.cli.preprocess --root_dir <vod_root> \
        --save_dir <out> --clips_dir <clips> \
        --pseudo_label_path <mot_labels> --true_label_path <gt_labels> \
        [--raft_weights raft-small.pth]
"""

import argparse


def main():
    p = argparse.ArgumentParser(description="VoD scene-flow preprocessing")
    p.add_argument("--root_dir", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--clips_dir", required=True)
    p.add_argument("--pseudo_label_path", required=True)
    p.add_argument("--true_label_path", required=True)
    p.add_argument("--raft_weights", default=None,
                   help="torch raft-small.pth checkpoint for camera flow")
    p.add_argument("--no_optical_flow", action="store_true")
    args = p.parse_args()

    from cmflow_tpu.preprocess.flow_samples import run_preprocess
    from cmflow_tpu.preprocess.optical_flow import (
        RaftSmallProvider,
        ZeroFlowProvider,
    )

    if args.no_optical_flow:
        provider = ZeroFlowProvider()
    else:
        provider = RaftSmallProvider(args.raft_weights)

    run_preprocess(
        root_dir=args.root_dir,
        save_dir=args.save_dir,
        clips_dir=args.clips_dir,
        pseudo_label_path=args.pseudo_label_path,
        true_label_path=args.true_label_path,
        opt_provider=provider,
    )


if __name__ == "__main__":
    main()

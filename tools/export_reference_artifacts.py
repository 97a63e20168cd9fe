"""Convert the reference's torch-pickle artifacts into framework formats.

  * bridged graphs (.dat) → npz (io/serialize.py layout)
  * AdvLearner checkpoints (.ckpt) → flax-variable pickles

Usage:
  python tools/export_reference_artifacts.py \
      --reference /root/reference --out ./converted
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bridged_gnn_tpu.io import load_pyg_data_dict, load_torch_state_dict
from bridged_gnn_tpu.io.ckpt_import import torch_state_dict_to_flax
from bridged_gnn_tpu.io.serialize import save_graph_npz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default="./converted")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    graphs_dir = os.path.join(args.reference, "data_bridged_graph")
    if os.path.isdir(graphs_dir):
        for f in sorted(os.listdir(graphs_dir)):
            if f.endswith(".dat"):
                data = load_pyg_data_dict(os.path.join(graphs_dir, f))
                out = os.path.join(args.out, f.replace(".dat", ".npz"))
                save_graph_npz(out, data)
                print("graph:", out, {k: v.shape for k, v in data.items()})

    ckpt_dir = os.path.join(args.reference, "ckpt")
    if os.path.isdir(ckpt_dir):
        for f in sorted(os.listdir(ckpt_dir)):
            if f.endswith(".ckpt"):
                sd = load_torch_state_dict(os.path.join(ckpt_dir, f))
                params, batch_stats = torch_state_dict_to_flax(sd)
                out = os.path.join(args.out, f.replace(".ckpt", ".flax.pkl"))
                with open(out, "wb") as fh:
                    pickle.dump(
                        {"params": params, "batch_stats": batch_stats}, fh
                    )
                print("ckpt:", out, f"({len(sd)} tensors)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Checkpoint converter CLI: reference torch .ckpt <-> this framework's
Orbax checkpoints, both directions.

  # torch -> orbax (two-stage model):
  python scripts/convert_checkpoint.py --config <stage2.yaml> \
      --from-torch model.ckpt --to out_dir/

  # orbax -> torch state_dict (loadable by the PyTorch reference):
  python scripts/convert_checkpoint.py --config <stage2.yaml> \
      --from-orbax out_dir/ --to model_back.pt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax

from hqtransformer_tpu.checkpoint import (export_torch_state_dict,
                                          latest_step, restore_checkpoint,
                                          save_checkpoint)
from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import TwoStageModel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    ap.add_argument('--from-torch', default=None)
    ap.add_argument('--from-orbax', default=None)
    ap.add_argument('--to', required=True)
    args = ap.parse_args()

    model = TwoStageModel(build_twostage_config(args.config))
    variables = model.init_variables(jax.random.PRNGKey(0))

    if args.from_torch:
        variables = model.load_reference_checkpoint(args.from_torch,
                                                    variables)
        save_checkpoint(args.to, variables, step=0)
        print(f'torch -> orbax: {args.to}')
    elif args.from_orbax:
        # accept both accepted layouts at their LATEST step: a two-stage
        # bundle ({'stage1','stage2'} — written by --from-torch above and by
        # main_stage2.py's ckpt_full/), or reject training-state dirs
        # (main_stage{1,2}.py ckpt/ holds a full TrainState, not variables)
        # with a pointer to the exportable artifact.
        step = latest_step(args.from_orbax)
        restored = restore_checkpoint(args.from_orbax, step=step)
        if not ('stage1' in restored and 'stage2' in restored):
            raise SystemExit(
                f'{args.from_orbax} (step {step}) is not a two-stage '
                f'bundle (keys: {sorted(restored)}); training ckpt/ dirs '
                'hold optimizer TrainState — pass the run\'s ckpt_full/ '
                'instead')
        variables = restored
        sd = {}
        sd.update(export_torch_state_dict(variables['stage1'],
                                          prefix='stage1.'))
        sd.update(export_torch_state_dict(variables['stage2'],
                                          prefix='stage2.'))
        import torch
        torch.save({'state_dict': {k: torch.from_numpy(v)
                                   for k, v in sd.items()}}, args.to)
        print(f'orbax -> torch: {args.to} ({len(sd)} tensors)')
    else:
        raise SystemExit('pass --from-torch or --from-orbax')


if __name__ == '__main__':
    main()

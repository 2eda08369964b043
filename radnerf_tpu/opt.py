"""Flag system — mirrors the reference's opt.py 1:1 (same names/defaults,
reference opt.py:3-140) so that its shell scripts translate mechanically,
plus a `TPU options` group for the mesh/runtime knobs that have no CUDA
counterpart."""

from __future__ import annotations

import argparse


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()

    # dataset parameters
    parser.add_argument('--root_dir', type=str, required=True,
                        help='root directory of dataset')
    parser.add_argument('--dataset_type', type=str, default='nsvf',
                        help='which dataset type to load')
    parser.add_argument('--dataset_name', type=str, default='llff',
                        help='which dataset to train/test')
    parser.add_argument('--scene_name', type=str, default='fern',
                        help='which specified scene of the dataset to train/test')
    parser.add_argument('--split', type=str, default='train',
                        choices=['train', 'trainval', 'trainvaltest'],
                        help='use which split to train')
    parser.add_argument('--downsample', type=float, default=1.0,
                        help='downsample factor (<=1.0) for the images')

    # model parameters
    parser.add_argument('--scale', type=float, default=1,
                        help='scene scale (whole scene must lie in [-scale, scale]^3')
    parser.add_argument('--hash_table_size', type=int, default=19,
                        help='T of NGP')

    # loss parameters
    parser.add_argument('--opacity_loss_w', type=float, default=1e-3,
                        help='weight of opacity loss, 0 to disable')
    parser.add_argument('--distortion_loss_w', type=float, default=0,
                        help='weight of distortion loss, 0 to disable')
    parser.add_argument('--disp_loss_w', type=float, default=0,
                        help='weight of disparity loss')

    # training options
    parser.add_argument('--batch_size', type=int, default=8192,
                        help='number of rays in a batch')
    parser.add_argument('--ray_sampling_strategy', type=str, default='pixel',
                        choices=['pixel', 'patch'],
                        help='pixel: uniform over all pixels of ALL images; '
                             'patch: uniform over patches')
    parser.add_argument('--patch_size', type=int, default=16,
                        help='size of patch image(16*16)')
    parser.add_argument('--num_epochs', type=int, default=30,
                        help='number of training epochs')
    parser.add_argument('--warmup_steps', type=int, default=256,
                        help='the iterations of warmup training')
    parser.add_argument('--num_gpus', type=int, default=1,
                        help='kept for script parity; see --num_devices')
    parser.add_argument('--num_view', type=int, default=0,
                        help='few-shot training setting (0 = full-shot)')
    parser.add_argument('--gpu_id', type=int, default=0,
                        help='kept for script parity (single-process TPU)')
    parser.add_argument('--lr', type=float, default=1e-2,
                        help='learning rate')

    # experimental training options
    parser.add_argument('--optimize_ext', action='store_true', default=False,
                        help='whether to optimize extrinsics')
    parser.add_argument('--random_bg', action='store_true', default=False,
                        help='train with random bg color (real scenes)')

    # depth priors options (plumbed-for-parity; see SURVEY.md §8 quirk 7)
    parser.add_argument("--depth_N_rand", type=int, default=4)
    parser.add_argument("--depth_N_iters", type=int, default=201)
    parser.add_argument("--depth_H", type=int, default=480)
    parser.add_argument("--depth_W", type=int, default=640)
    parser.add_argument("--depth_lrate", type=float, default=4e-4)
    parser.add_argument("--depth_i_weights", type=int, default=100)
    parser.add_argument("--depth_i_print", type=int, default=20)
    parser.add_argument('--depth_loss_w', type=float, default=0)

    # moe training options
    parser.add_argument('--moe_training', action='store_true', default=False,
                        help='whether to apply moe training')
    parser.add_argument("--model_zoo_size", type=int, default=5,
                        help='the number of models')
    parser.add_argument('--gate_type', type=str, default='ray',
                        help='the type of gating net (ray | image | position)')
    parser.add_argument('--model_type', type=str, default='switch',
                        help='model type for the other-baseline entry '
                             '(switch | block | mega)')
    parser.add_argument('--diversity_loss_w', type=float, default=0)
    parser.add_argument('--cv_loss_w', type=float, default=0)
    parser.add_argument('--depth_mutual_loss_w', type=float, default=0)
    parser.add_argument('--overlap_ratio', type=float, default=0.25)

    # moe distillation options
    parser.add_argument('--t_ckpt_path', type=str, default=None)
    parser.add_argument('--feat_loss_w', type=float, default=0)

    # validation options
    parser.add_argument('--eval_lpips', action='store_true', default=False)
    parser.add_argument('--val_only', action='store_true', default=False)
    parser.add_argument('--no_save_test', action='store_true', default=False)

    # misc
    parser.add_argument('--exp_name', type=str, default='base')
    parser.add_argument('--ckpt_path', type=str, default=None,
                        help='checkpoint to resume from (params + opt state)')
    parser.add_argument('--resume', type=str, default=None,
                        choices=['auto'],
                        help="'auto': continue from the newest loadable "
                             'checkpoint in the experiment ckpt dir (fresh '
                             'start when none exists) — restart-safe '
                             'training without tracking paths; an explicit '
                             '--ckpt_path wins')
    parser.add_argument('--weight_path', type=str, default=None,
                        help='weights to warm-start from (params only)')

    # ---- TPU options (new; no reference counterpart) ----
    tpu = parser.add_argument_group('TPU options')
    tpu.add_argument('--num_devices', type=int, default=0,
                     help='devices in the ray-parallel mesh (0 = all local)')
    tpu.add_argument('--samples_per_ray', type=int, default=192,
                     help='static per-ray occupied-sample budget S')
    tpu.add_argument('--layout', type=str, default='flat',
                     choices=['flat', 'dense'],
                     help='training sample layout: flat = static-CSR '
                          'compacted buffer (zero padding waste, the TPU '
                          'twin of the reference CSR pipeline), dense = '
                          '(N, S) per-ray grid')
    tpu.add_argument('--budget_per_ray', type=int, default=64,
                     help='flat layout: average per-ray sample budget '
                          '(total buffer B = batch * budget)')
    tpu.add_argument('--compute_dtype', type=str, default='bfloat16',
                     choices=['float32', 'bfloat16'],
                     help='MLP/hash-gather compute dtype (params stay fp32)')
    tpu.add_argument('--hash_impl', type=str, default='auto',
                     choices=['auto', 'xla', 'pallas', 'sort', 'window',
                              'dedup', 'slab', 'slab_plain', 'brick',
                              'brick3', 'brick3_plain'],
                     help='hash-grid encode backend (ops/hashgrid.py '
                          'encode_dispatch); slab/brick use TPU-native '
                          'table layouts with their own hashes — '
                          'checkpoints are tied to the impl family that '
                          'trained them')
    tpu.add_argument('--val_chunk', type=int, default=4096,
                     help='rays per test-time render chunk (round-5 v5e '
                          'sweep at the new test budget 16 x k_block '
                          '512: 2048 -> 57.9k rays/s, 4096 -> 57.5k, '
                          '8192 -> 55.0k, 16384 -> 42.5k — smaller '
                          'chunks retire whole while-loops sooner; '
                          'docs/PERF_NOTES.md)')
    tpu.add_argument('--adaptive_budget', action=argparse.BooleanOptionalAction,
                     default=True,
                     help='re-pick the flat-layout sample budget bucket '
                          'from measured buffer utilization at grid-update '
                          'boundaries (the effective stream shrinks as the '
                          'density grid prunes; one cached compile per '
                          'bucket). Default on; --no-adaptive_budget pins '
                          'the static --budget_per_ray')
    tpu.add_argument('--microbatch', type=int, default=0,
                     help='gradient-accumulation slices per local ray '
                          'batch (identical expected gradient, lower peak '
                          'HBM). 0 = AUTO: one slice per 4096 local rays, '
                          'which keeps the reference headline batch 8192 '
                          'off the measured v5e single-pass memory-'
                          'pressure cliff (docs/PERF_NOTES.md); 1 forces '
                          'single-pass')
    tpu.add_argument('--multihost', action='store_true', default=False,
                     help='join a multi-host pod slice via '
                          'jax.distributed.initialize before building the '
                          'mesh (run one process per host)')
    tpu.add_argument('--ckpt_backend', type=str, default='pickle',
                     choices=['pickle', 'orbax'],
                     help='full-checkpoint format: single-file pickle or '
                          'async orbax directory (training never blocks '
                          'on serialization)')
    tpu.add_argument('--profile_steps', type=int, default=0,
                     help='capture a jax.profiler trace for this many '
                          'steps (starting at step 10) into the log dir')
    tpu.add_argument('--host_sampling', action='store_true', default=False,
                     help='sample ray batches on host instead of on device '
                          '(for datasets too large for HBM)')
    tpu.add_argument('--seed', type=int, default=1337)
    tpu.add_argument('--steps_per_epoch', type=int, default=0,
                     help='override the 1000 virtual steps/epoch '
                          '(datasets/base.py:19-21); 0 = reference default')
    return parser


def get_opts(args=None):
    return get_parser().parse_args(args)

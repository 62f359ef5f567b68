# Round-5 reference-budget vision artifacts at full dataset scale
# (VERDICT r4 "next round" item 2). Sourced by scripts/chip_queue.sh.
#
# Shapes are the REAL dataset shapes (synthetic content, real geometry):
# Omniglot 1623 classes x 20 samples, 1100/100/423 split, x4 rotations
# (reference utils/data_pre.py:17-39); Mini-ImageNet 64/16/20 classes x
# 600 samples (data_pre.py:70-110). Budgets are the reference's canonical
# ones (vision/maml_vision.py:15-25 / anil_vision.py:15-25).

# 1. MAML-Omniglot at the reference budget (5k iters x mb32, 5w1s,
#    f32 reference-exact semantics), fused path.
run omni_ref_budget 2400 python scripts/maml_vision.py \
  --synthetic --synth_classes 1623 --synth_per_class 20 \
  --num_iterations 5000 --meta_batch_size 32 --fuse 10 --save_every 1000

# 2. 3-seed sweep of the same config as ONE vmapped XLA program.
run omni_sweep3 4800 python scripts/sweep.py maml_vision --seeds 42,7,123 \
  --vmap_seeds --synthetic --synth_classes 1623 --synth_per_class 20 \
  --num_iterations 5000 --meta_batch_size 32 --fuse 10

# 3. ANIL Mini-ImageNet at the reference budget (10k iters x mb32, 5w5s,
#    reference anil_vision.py params; bf16 = the documented recommended
#    throughput setting, parity-gated by scripts/parity_check.py --bf16).
run anil_min_ref_budget 5400 python scripts/anil_vision.py --dataset min \
  --synthetic --synth_per_class 600 --ways 5 --shots 5 \
  --outer_lr 0.003 --inner_lr 0.5 --adapt_steps 1 \
  --num_iterations 10000 --meta_batch_size 32 --fuse 10 --bf16 \
  --save_every 1000

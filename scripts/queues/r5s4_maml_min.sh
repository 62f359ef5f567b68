# Round-5 session 4: the one missing reference-budget vision artifact —
# MAML Mini-ImageNet (reference vision/maml_vision.py:15-25 with
# dataset="min": 5w1s, outer 0.003, inner 0.5, adapt 1, 10k x mb32).
# Real dataset geometry (64/16/20 classes x 600, synthetic content),
# fused path, bf16 (the documented recommended throughput setting,
# parity-gated by scripts/parity_check.py --bf16). Completes the family:
# omni MAML (r5s1), min ANIL (r5s1), min MAML (here).

run maml_min_ref_budget 7200 python scripts/maml_vision.py --dataset min \
  --synthetic --synth_per_class 600 --ways 5 --shots 1 \
  --outer_lr 0.003 --inner_lr 0.5 --adapt_steps 1 \
  --num_iterations 10000 --meta_batch_size 32 --fuse 10 --bf16 \
  --save_every 1000

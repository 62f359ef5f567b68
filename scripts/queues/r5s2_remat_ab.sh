# Round-5 ANIL-min layout/byte-reduction A/B (VERDICT r4 item 1) + the
# chunk-fixed full-scale vision sweep (item 2 remainder).

# 1. Control roofline with the new --mem temp-stream/arg-share report
run roofline_anil_ctl 1800 python scripts/roofline.py --config anil_min \
  --bf16 --time --mem
# 2. The FLOPs-for-bytes A/B: body conv blocks rematerialized
run roofline_anil_remat 1800 python scripts/roofline.py --config anil_min \
  --bf16 --time --mem --remat_body
# 3. Scaling check at mb8 (a flat ratio change proves it is byte-
#    proportional, not a fixed overhead)
run roofline_anil_remat_mb8 1800 python scripts/roofline.py --config anil_min \
  --bf16 --time --mem --remat_body --meta_batch 8
# 4. omni control for completeness (remat is ANIL-only; this pins the
#    new roofline output format on the other flagship)
run roofline_omni_ctl 1800 python scripts/roofline.py --config maml_omni \
  --bf16 --time --mem

# 5. End-to-end bench A/B
run bench_anil_ctl 2400 python bench.py --config anil_min
run bench_anil_remat 2400 env EMT_BENCH_REMAT=1 python bench.py --config anil_min

# 6. Full-scale 3-seed vision sweep, now chunk-driven (--fuse 10 is
#    honored in the vmapped path; the whole-budget single dispatch
#    crashed the TPU worker twice in r5s1/r5s1b)
run omni_sweep3 4800 python scripts/sweep.py maml_vision --seeds 42,7,123 \
  --vmap_seeds --synthetic --synth_classes 1623 --synth_per_class 20 \
  --num_iterations 5000 --meta_batch_size 32 --fuse 10

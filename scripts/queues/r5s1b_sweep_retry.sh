# Retry of the r5s1 omni_sweep3 (TPU worker crash mid-run, likely
# transient tunnel/worker restart — the identical program at identical
# scale ran fine as three serial runs' worth of compute in r5s1's other
# steps).
run omni_sweep3 4800 python scripts/sweep.py maml_vision --seeds 42,7,123 \
  --vmap_seeds --synthetic --synth_classes 1623 --synth_per_class 20 \
  --num_iterations 5000 --meta_batch_size 32 --fuse 10

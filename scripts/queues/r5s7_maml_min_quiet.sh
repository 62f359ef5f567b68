# r5s7: re-run the MAML-min reference-budget artifact on a QUIET box.
# The r5s4 run overlapped the 38-min CPU test suite on this 1-core host and
# its driver loop was starved to 4.77 it/s (quiet steady-state is ~11.4 it/s,
# chip_logs/r5s6 + BASELINE.md r5s4 note).
maml_min_ref_budget_quiet|3600|python scripts/maml_vision.py --dataset min --synthetic --synth_per_class 600 --ways 5 --shots 1 --outer_lr 0.003 --inner_lr 0.5 --adapt_steps 1 --num_iterations 10000 --meta_batch_size 32 --fuse 10 --bf16 --save_every 1000

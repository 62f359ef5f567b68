# Round-5 session 8: regenerate BENCH_FULL.json with the new
# trpo_particles_fast config included (bf16 + fuse 20, the documented
# fast MAML-TRPO flags promoted to a first-class bench row). Quiet box
# required for the host-env rows (host-CPU contention rule, BASELINE.md
# r5s5).

run bench_all_r5s8 3600 python bench.py --all

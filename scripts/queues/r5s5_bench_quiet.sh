# Round-5 session 5: re-measure the full bench on a QUIET box. The r5s3
# bench --all overlapped a CPU test-suite run on this 1-core machine:
# host-env rows (MuJoCo physics on the host CPU) dropped 30-40% while
# every TPU-bound row stayed flat — classic host-CPU contention, not a
# regression. Chained behind the r5s4 artifact run; the launcher also
# waits for any live pytest pid (see r5s5_launch.sh).

run bench_all_quiet 3600 python bench.py --all

# Round-5 session 3: TPU-only suite after the measured-loser kernel trim
# (should be minutes, not ~40 — whole-base CNN4 + rollout Mosaic compiles
# are gone), then the full bench artifact with the pinned multi-rep
# denominator protocol.

run pallas_tpu 2400 env EMT_TEST_TPU=1 python -m pytest tests/test_pallas_tpu.py -q

run bench_all 7200 python bench.py --all

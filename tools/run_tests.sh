#!/bin/bash
# Full-suite run with machine-readable evidence (VERDICT r2 #10):
# junit xml + the final pass/fail count line, both under .bench_logs/.
# Single CPU core: takes 30-45 min; don't run concurrently with TPU
# benchmark compiles (tracing contends).
cd /root/repo || exit 1
mkdir -p .bench_logs
JAX_PLATFORMS=cpu python -m pytest tests/ -q -ra \
  --junitxml=.bench_logs/pytest.xml 2>&1 | tee .bench_logs/pytest.out
rc=${PIPESTATUS[0]}
echo "pytest rc=$rc" >> .bench_logs/pytest.out
exit "$rc"

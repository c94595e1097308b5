#!/usr/bin/env bash
# Coverage report, mirroring the reference's coverage.sh:1-41
# (llvm-cov instrument-coverage HTML report for cargo test).
# Python equivalent: coverage.py over the pytest suite.
set -euo pipefail
cd "$(dirname "$0")"

if ! python -c "import coverage" 2>/dev/null; then
  echo "coverage.py not installed; run: pip install coverage" >&2
  exit 1
fi

python -m coverage run --source=icp_rust_tpu -m pytest tests/ -q
python -m coverage report -m
python -m coverage html -d coverage_html
echo "HTML report: coverage_html/index.html"

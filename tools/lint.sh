#!/usr/bin/env bash
# Lint gate (reference parity: tools/mypy.sh + pre-commit lint CI).
# Uses ruff when installed; otherwise falls back to a dependency-free
# syntax + import sweep so the gate still catches broken files in
# hermetic images where pip installs are unavailable.
set -u
cd "$(dirname "$0")/.."

if command -v ruff >/dev/null 2>&1; then
    exec ruff check kvcached_tpu/ tests/ benchmarks/ examples/
fi

echo "ruff not installed - falling back to compile sweep" >&2
python - <<'EOF'
import compileall
import sys

ok = True
for tree in ("kvcached_tpu", "tests", "benchmarks", "examples"):
    ok &= compileall.compile_dir(tree, quiet=1, force=True)
sys.exit(0 if ok else 1)
EOF

#!/usr/bin/env bash
# Type-check gate over the core package (reference parity:
# /root/reference/tools/mypy.sh checks kvcached/ with a pinned mypy).
# Non-strict: the kernel/step-fn code is shape-polymorphic by design;
# the value is in the allocator/controller/CLI layers.
set -u
cd "$(dirname "$0")/.."

if ! command -v mypy >/dev/null 2>&1; then
    echo "mypy not installed - skipping (CI installs it; hermetic dev images may not)" >&2
    exit 0
fi

exec mypy --config-file pyproject.toml kvcached_tpu/

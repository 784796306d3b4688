#!/bin/bash
# Release checklist: imports, unit+e2e suite, multichip dryrun, single-chip
# compile check. Run bench.py separately on TPU hardware.
set -e
cd "$(dirname "$0")/.."

echo "== module imports =="
python -c "
import importlib, pkgutil, gpv_tpu
for m in pkgutil.walk_packages(gpv_tpu.__path__, 'gpv_tpu.'):
    importlib.import_module(m.name)
print('all modules import OK')"

echo "== test suite =="
python -m pytest tests/ -x -q

echo "== multichip dryrun (8 virtual CPU devices) =="
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python -c "
import jax; jax.config.update('jax_platforms','cpu')
import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "CI OK"

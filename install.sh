#!/usr/bin/env bash
# Install pydca_tpu from this checkout into the current environment.
# Mirrors the reference's install.sh role (KIT-MBS/pydca install.sh).
set -euo pipefail

MIN=310
HAVE=$(python3 -c 'import sys; print(sys.version_info[0]*100+sys.version_info[1])')
if [ "${HAVE}" -lt "${MIN}" ]; then
    echo "ERROR: pydca_tpu needs Python >= 3.10 (found $(python3 -V))" >&2
    exit 1
fi

echo "Installing pydca_tpu (console scripts: mfdca, plmdca, pydca, a2m2aln)"
pip install -e "$(dirname "$0")"
echo "Done.  On a Cloud TPU VM, install the TPU-enabled jax first:"
echo '  pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html'

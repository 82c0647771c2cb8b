"""TPU environment defaults for the Mosaic compile helper.

On the axon-attached v5e, the Pallas/Mosaic backend compiles through a
`tpu_compile_helper` subprocess whose libtpu init reads the accelerator
type and worker hostnames from the environment. When unset, every Pallas
compile fails with `HTTP 500 ... Failed to find host bounds for
accelerator type` (observed round 3). The helper inherits this process's
environment, so setting the defaults before the first Pallas compile is
sufficient. Harmless on CPU and on properly-provisioned TPU VMs (setdefault
never overrides an explicit setting).
"""

from __future__ import annotations

import os


def ensure_tpu_compile_env() -> None:
    """Default the libtpu topology vars needed by the Mosaic helper."""
    os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

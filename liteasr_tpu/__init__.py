"""liteasr_tpu: a TPU-native (JAX/XLA/Pallas/pjit) ASR framework with the
capability surface of LiteASR (reference at /root/reference).

Importing the package populates every component registry
(reference: liteasr/__init__.py:3-9).
"""

__version__ = "0.1.0"

from liteasr_tpu.config import config_init as _config_init

_config_init()

import liteasr_tpu.data.transform  # noqa: E402,F401
import liteasr_tpu.criterions  # noqa: E402,F401
import liteasr_tpu.models  # noqa: E402,F401
import liteasr_tpu.optims  # noqa: E402,F401
import liteasr_tpu.tasks  # noqa: E402,F401

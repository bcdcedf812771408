"""Training dispatcher (reference: src/training/__init__.py:11-24).

Routes ``training.method == "azr"`` configs to the AZR self-play pipeline;
everything else goes to the standard trainer.
"""

from __future__ import annotations

import json
import logging
import threading
from typing import Optional

logger = logging.getLogger(__name__)


def train_from_config(config_path: str,
                      stop_event: Optional[threading.Event] = None):
    with open(config_path, "r", encoding="utf-8") as f:
        config_data = json.load(f)
    method = config_data.get("training", {}).get("method", "")
    if method == "azr":
        from apertis_llm_tpu.training.azr_pipeline import (
            train_from_config as azr_train)

        logger.info("Dispatching to AZR self-play pipeline")
        return azr_train(config_path, stop_event=stop_event)
    from apertis_llm_tpu.training.pipeline import (
        train_from_config as standard_train)

    return standard_train(config_path, stop_event=stop_event)

"""Absolute Zero Reasoner self-play pipeline.

Behavioural port of the reference trainer (reference:
src/training/azr_pipeline.py:30-256): per iteration, PROPOSE
``tasks_per_iteration`` tasks (generate -> validate -> reward), then SOLVE
each valid task (generate -> validate -> reward), with force-accept warmup
(tasks while iteration <= threshold, solutions while valid-task count <= min)
and tracker persistence + model checkpoints every N iterations.

Faithfully preserved quirk: the loop performs **no optimizer step** — AZR in
the reference is self-play data generation + scoring with frozen weights
(SURVEY.md §3.4). ``self.update_hook`` is the documented extension point for
an actual RL/SFT-on-self-play update.

Config schema: ``{"data": {...}, "model": {...}, "training": {...},
"azr": {...}}`` with dispatch on ``training.method == "azr"``.
"""

from __future__ import annotations

import json
import logging
import os
import threading
from typing import Any, Callable, Dict, Optional

import numpy as np

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.training.azr import (
    PythonExecutor, RewardCalculator, SelfPlayTracker, SolutionGenerator,
    SolutionValidator, TaskGenerator, TaskValidator, default_reward_modules)
from apertis_llm_tpu.training.azr.executor import setup_logging as azr_setup_logging

logger = logging.getLogger(__name__)


class AbsoluteZeroReasonerTrainer:
    def __init__(self, config_path: str,
                 stop_event: Optional[threading.Event] = None):
        with open(config_path, "r", encoding="utf-8") as f:
            self.config_data = json.load(f)
        self.azr_config = self.config_data.get("azr", {})
        self.model_config_dict = self.config_data.get("model", {})
        self.data_config = self.config_data.get("data", {})
        self.training_config = self.config_data.get("training", {})
        self.output_dir = self.training_config.get("output_dir", "output")

        self._setup_logging()
        self.config, self.engine, self.tokenizer = self._setup_model_and_tokenizer()
        self._init_components()
        self.stop_event = stop_event or threading.Event()
        # Extension point: called as update_hook(tracker) after each iteration
        # to implement a real policy update over the scored self-play data.
        # The reference never updates weights (SURVEY.md §3.4); setting
        # azr.enable_sft_updates installs the built-in SFT update below.
        self.update_hook: Optional[Callable[[SelfPlayTracker], None]] = None
        if self.azr_config.get("enable_sft_updates", False):
            self._init_sft_updater()
        logger.info("Initialized all AZR components")

    def _setup_logging(self) -> None:
        log_file = self.azr_config.get("log_file")
        if log_file:
            os.makedirs(self.output_dir, exist_ok=True)
            log_file = os.path.join(self.output_dir, log_file)
        azr_setup_logging(self.azr_config.get("log_level", "INFO"), log_file)

    def _setup_model_and_tokenizer(self):
        import jax

        from apertis_llm_tpu.inference.engine import InferenceEngine
        from apertis_llm_tpu.models.params import init_params

        from transformers import AutoTokenizer

        tokenizer_name = self.data_config.get("tokenizer_name", "gpt2")
        tokenizer = AutoTokenizer.from_pretrained(tokenizer_name)
        logger.info("Loaded HF tokenizer for AZR: %s", tokenizer_name)

        cfg = dict(self.model_config_dict)
        cfg["vocab_size"] = tokenizer.vocab_size
        for attr in ("pad_token_id", "bos_token_id", "eos_token_id",
                     "unk_token_id"):
            val = getattr(tokenizer, attr, None)
            if val is not None:
                cfg[attr] = val
        config = ApertisConfig.from_dict(cfg)

        base_path = self.training_config.get("pretrained_model_path")
        if base_path:
            from apertis_llm_tpu.models.convert import load_pretrained

            _, params = load_pretrained(base_path)
        else:
            params = init_params(
                jax.random.PRNGKey(self.training_config.get("seed", 0)), config)
        engine = InferenceEngine(config, params,
                                 dtype=self.training_config.get("dtype"))
        return config, engine, tokenizer

    def _init_components(self) -> None:
        self.python_executor = PythonExecutor(
            self.azr_config.get("python_executor", {}))
        self.task_generator = TaskGenerator(
            self.azr_config.get("task_generator", {}))
        self.task_validator = TaskValidator(
            self.azr_config.get("task_validator", {}), self.python_executor)
        self.solution_generator = SolutionGenerator(
            self.azr_config.get("solution_generator", {}))
        self.solution_validator = SolutionValidator(
            self.azr_config.get("solution_validator", {}), self.python_executor)
        reward_configs = self.azr_config.get("rewards", {})
        self.reward_calculator = RewardCalculator(
            reward_configs, default_reward_modules(reward_configs))
        self.tracker = SelfPlayTracker(
            self.azr_config, os.path.join(self.output_dir, "azr_data"))

    # -- model text generation -----------------------------------------
    def _generate_text(self, prompt: str, max_new_tokens: int = 512,
                       temperature: float = 0.7, top_p: float = 0.9) -> str:
        max_prompt = self.config.max_position_embeddings // 2
        ids = self.tokenizer(prompt, truncation=True,
                             max_length=max_prompt)["input_ids"]
        input_ids = np.asarray([ids], np.int32)
        out = self.engine.generate(
            input_ids,
            max_new_tokens=max_new_tokens,
            do_sample=True,
            temperature=temperature,
            top_p=top_p,
            eos_token_id=(self.tokenizer.eos_token_id
                          if self.tokenizer.eos_token_id is not None
                          else self.config.eos_token_id),
            pad_token_id=(self.tokenizer.pad_token_id
                          if self.tokenizer.pad_token_id is not None else 0),
        )
        new_ids = out[0, input_ids.shape[1]:].tolist()
        return self.tokenizer.decode(new_ids, skip_special_tokens=True)

    # -- built-in self-play SFT update ---------------------------------
    def _init_sft_updater(self) -> None:
        """Install an update_hook that fine-tunes the policy on the valid
        (task, solution) pairs collected so far — reward-weighted SFT.

        This makes AZR actually learn from self-play (capability upgrade:
        the reference checkpoints frozen weights, SURVEY.md §3.4).
        """
        import jax

        from apertis_llm_tpu.training.step import (
            create_train_state, make_optimizer, make_train_step)

        sft_cfg = self.azr_config.get("sft", {})
        self._sft_max_len = sft_cfg.get("max_length", 256)
        self._sft_batch = sft_cfg.get("batch_size", 4)
        self._sft_steps = sft_cfg.get("steps_per_iteration", 4)
        self._sft_min_reward = sft_cfg.get("min_total_reward", 0.0)
        tx, _ = make_optimizer(
            sft_cfg.get("learning_rate", 1e-5),
            total_steps=self.azr_config.get("num_iterations", 100)
            * self._sft_steps,
            gradient_accumulation_steps=1)
        self._sft_tx = tx
        self._sft_step_fn = jax.jit(
            make_train_step(self.config, tx,
                            self.training_config.get("dtype")),
            donate_argnums=(0,))
        self._sft_state = create_train_state(
            self.engine.params, tx,
            jax.random.PRNGKey(self.training_config.get("seed", 0)))
        self._sft_consumed = 0
        self.update_hook = self._sft_update

    def _sft_update(self, tracker: SelfPlayTracker) -> None:
        import jax.numpy as jnp

        records = tracker.solution_history[self._sft_consumed:]
        self._sft_consumed = len(tracker.solution_history)
        pairs = [
            (r["task"].get("task", ""), r["solution"].get("solution", ""),
             r["rewards"].get("total", 0.0))
            for r in records
            if r["validation"].get("is_valid", False)
            and r["rewards"].get("total", 0.0) >= self._sft_min_reward
        ]
        if not pairs:
            return
        tok, pad = self.tokenizer, (self.tokenizer.pad_token_id or 0)
        rows, labels_rows = [], []
        for task, solution, _reward in pairs:
            prompt_ids = tok(f"### Problem ###\n{task}\n\n### Solution ###",
                             truncation=True,
                             max_length=self._sft_max_len // 2)["input_ids"]
            sol_ids = tok("\n" + solution, truncation=True,
                          max_length=self._sft_max_len // 2)["input_ids"]
            ids = (prompt_ids + sol_ids)[: self._sft_max_len]
            lab = ([-100] * len(prompt_ids) + sol_ids)[: self._sft_max_len]
            n_pad = self._sft_max_len - len(ids)
            rows.append(ids + [pad] * n_pad)
            labels_rows.append(lab + [-100] * n_pad)
        ids = np.asarray(rows, np.int32)
        labels = np.asarray(labels_rows, np.int32)
        mask = (ids != pad).astype(np.int32)

        n = ids.shape[0]
        reps = -(-self._sft_batch // n)
        ids = np.tile(ids, (reps, 1))[: self._sft_batch]
        labels = np.tile(labels, (reps, 1))[: self._sft_batch]
        mask = np.tile(mask, (reps, 1))[: self._sft_batch]
        batch = {"input_ids": jnp.asarray(ids),
                 "attention_mask": jnp.asarray(mask),
                 "labels": jnp.asarray(labels)}
        loss = None
        for _ in range(self._sft_steps):
            self._sft_state, metrics = self._sft_step_fn(self._sft_state, batch)
            loss = float(metrics["loss"])
        # The policy the generators sample from IS the updated one.
        self.engine.params = self._sft_state.params
        logger.info("AZR SFT update on %d pairs: loss=%.4f", len(pairs), loss)

    # -- main loop ------------------------------------------------------
    def train(self) -> Dict[str, Any]:
        logger.info("Starting Absolute Zero Reasoner self-play loop")
        num_iterations = self.azr_config.get("num_iterations", 100)
        tasks_per_iteration = self.azr_config.get("tasks_per_iteration", 5)
        checkpoint_interval = self.azr_config.get("checkpoint_interval", 10)
        force_tasks = self.azr_config.get("force_accept_tasks", True)
        force_solutions = self.azr_config.get("force_accept_solutions", True)
        force_threshold = self.azr_config.get("force_accept_threshold", 10)
        min_valid_for_val = self.azr_config.get(
            "min_valid_tasks_before_validation", 20)

        start = self.tracker.get_metrics()["iterations"] + 1
        for iteration in range(start, start + num_iterations):
            if self.stop_event.is_set():
                logger.info("Stop event received at iteration %d.", iteration)
                break
            logger.info("AZR iteration %d/%d", iteration,
                        start + num_iterations - 1)
            metrics = self.tracker.get_metrics()
            should_force_tasks = force_tasks and iteration <= force_threshold
            should_force_solutions = (force_solutions
                                      and metrics["tasks_valid"] <= min_valid_for_val)

            valid_tasks = []
            attempted = valid_count = 0
            for _ in range(tasks_per_iteration):
                if self.stop_event.is_set():
                    break
                task_info = self.task_generator.generate_task(self._generate_text)
                attempted += 1
                validation = self.task_validator.validate(task_info)
                if should_force_tasks and not validation.get("is_valid", False):
                    validation["is_valid"] = True
                    validation["reason"] = "Forced accept"
                if validation["is_valid"]:
                    valid_count += 1
                    rewards = self.reward_calculator.calculate_task_rewards(
                        task_info, validation, valid_tasks)
                    self.tracker.update_task_metrics(task_info, validation, rewards)
                    valid_tasks.append(task_info)
                else:
                    self.tracker.update_task_metrics(task_info, validation,
                                                     {"total": 0})
            if self.stop_event.is_set():
                break
            task_rate = valid_count / attempted if attempted else 0

            sol_attempted = sol_valid = 0
            for task_info in valid_tasks:
                if self.stop_event.is_set():
                    break
                solution = self.solution_generator.generate_solution(
                    task_info, self._generate_text)
                sol_attempted += 1
                validation = self.solution_validator.validate(task_info, solution)
                if should_force_solutions and not validation.get("is_valid", False):
                    validation["is_valid"] = True
                    validation["reason"] = "Forced accept"
                if validation["is_valid"]:
                    sol_valid += 1
                    rewards = self.reward_calculator.calculate_solution_rewards(
                        validation)
                    self.tracker.update_solution_metrics(
                        task_info, solution, validation, rewards)
                else:
                    self.tracker.update_solution_metrics(
                        task_info, solution, validation, {"total": 0})
            if self.stop_event.is_set():
                break
            sol_rate = sol_valid / sol_attempted if sol_attempted else 0
            self.tracker.record_iteration_stats(task_rate, sol_rate)

            summary = self.tracker.get_summary_metrics()
            logger.info("Iteration %d: task rate=%.2f, solution rate=%.2f",
                        iteration, summary["task_valid_rate"],
                        summary["solution_valid_rate"])

            if self.update_hook is not None:
                self.update_hook(self.tracker)

            if iteration % checkpoint_interval == 0 and not self.stop_event.is_set():
                self._save_checkpoint(iteration)

        if not self.stop_event.is_set():
            self._save_checkpoint(self.tracker.get_metrics()["iterations"])
        logger.info("AZR training process finished.")
        return self.tracker.get_summary_metrics()

    def _save_checkpoint(self, iteration: int) -> None:
        from apertis_llm_tpu.models.convert import save_torch_checkpoint

        ckpt_dir = os.path.join(
            self.output_dir,
            self.azr_config.get("checkpoint_dir", "azr_checkpoints"),
            f"model_iter_{iteration}")
        try:
            save_torch_checkpoint(self.engine.params, self.config, ckpt_dir)
            self.tokenizer.save_pretrained(ckpt_dir)
            logger.info("AZR saved model + tokenizer to %s", ckpt_dir)
        except Exception as e:
            logger.error("AZR checkpoint error: %s", e, exc_info=True)


def train_from_config(config_path: str,
                      stop_event: Optional[threading.Event] = None):
    trainer = AbsoluteZeroReasonerTrainer(config_path, stop_event)
    return trainer.train()


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1:
        train_from_config(sys.argv[1])
    else:
        print("Usage: python -m apertis_llm_tpu.training.azr_pipeline <config.json>")

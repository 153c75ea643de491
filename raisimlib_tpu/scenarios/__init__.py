"""Serialized scenario configs (SURVEY.md C12: RaiSim loads worlds from XML
world-description files; here each BASELINE config is a YAML file consumed by
its example)."""

from raisimlib_tpu.scenarios.loader import (build_scene, build_world, load,
                                            scenario_path)

__all__ = ["build_scene", "build_world", "load", "scenario_path"]

"""Model layer: dbt-style named transformations with ref() resolution."""

from .registry import Model, ModelRegistry, example_models

__all__ = ["Model", "ModelRegistry", "example_models"]

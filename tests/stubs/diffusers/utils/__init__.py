import logging as _logging

WEIGHTS_NAME = "diffusion_pytorch_model.bin"


class BaseOutput:
    """Attribute-bag base; reference subclasses add @dataclass fields."""

    def __getitem__(self, k):
        return getattr(self, k)

    def keys(self):
        return [f for f in self.__dataclass_fields__]  # type: ignore


class logging:  # noqa: N801 — mimic diffusers.utils.logging module
    @staticmethod
    def get_logger(name=None):
        return _logging.getLogger(name or "diffusers")


get_logger = logging.get_logger


class import_utils:  # noqa: N801
    @staticmethod
    def is_xformers_available():
        return False


def is_xformers_available():
    return False

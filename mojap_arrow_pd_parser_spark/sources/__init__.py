"""Sources: reader/writer facade + format inference."""
from . import inference, reader, writer  # noqa: F401

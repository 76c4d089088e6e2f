from . import checkpoint, monitor

from . import rope, norms, attention

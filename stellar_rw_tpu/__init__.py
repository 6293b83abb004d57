"""TPU-native second-order random-walk + skip-gram embedding framework."""

__version__ = "0.1.0"

from .tracker import IoUTracker, Track

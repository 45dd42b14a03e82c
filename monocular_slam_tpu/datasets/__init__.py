"""Dataset loaders: TUM RGB-D, KITTI odometry, Middlebury temple, synthetic."""

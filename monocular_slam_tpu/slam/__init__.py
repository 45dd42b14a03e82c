"""SLAM engine: state model, tracker, mapping, pipeline orchestration."""

"""Offline visualization (matplotlib, file output) — replaces the reference's
interactive OpenCV/PCL windows with renderable artifacts."""

"""Physics packages (reference: epoch2d/src/physics_packages/)."""

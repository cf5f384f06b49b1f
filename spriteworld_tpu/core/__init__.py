"""Engine core: state pytrees, distributions, generators, actions, tasks, env."""

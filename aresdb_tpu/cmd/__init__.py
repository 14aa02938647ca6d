"""CLI daemons (aresd, broker, controller) and the interactive shell."""

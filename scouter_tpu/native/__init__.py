"""Native (C++) host runtime components. See stager.cpp."""

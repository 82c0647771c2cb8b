# Build the native runtime library (C++): CoLa parser, device clients,
# scan feeder. Output: native/build/libtpu_slam_native.so

.PHONY: native test clean

native:
	cmake -S native -B native/build -DCMAKE_BUILD_TYPE=Release >/dev/null
	cmake --build native/build -j

test: native
	python -m pytest tests/ -q

clean:
	rm -rf native/build

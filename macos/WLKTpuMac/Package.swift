// swift-tools-version:5.9
// Native macOS client for the whisperlivekit_tpu server (role of the
// reference's macos/WhisperLiveKitMac: AVAudio capture → /asr WebSocket →
// live transcript view). Build: `swift build` / open in Xcode.
import PackageDescription

let package = Package(
    name: "WLKTpuMac",
    platforms: [.macOS(.v13)],
    targets: [
        .executableTarget(name: "WLKTpuMac", path: "Sources/WLKTpuMac")
    ]
)
